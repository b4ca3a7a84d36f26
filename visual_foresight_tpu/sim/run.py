"""Data-collection / benchmark CLI (reference ``visual_mpc/sim/run.py``).

Usage::

    python -m visual_foresight_tpu.sim.run <hparams.py> \
        [--nworkers N] [--benchmark] [--nsplit K --isplit I] [--iex N]

The hparams file is executable Python exporting a module-level ``config`` dict
(same format as the reference).  Trajectory ranges are split across worker
processes; a dedicated saver process writes TFRecords.  The reference's
ray-based cloud rsync is replaced by a background-thread dir sync
(``util/synchronize_tfrecs.py``) since the only use was a 10s rsync loop.
"""

import argparse
import copy
import datetime
import glob
import importlib.machinery
import importlib.util
import os
import random
import shutil
import sys
from multiprocessing import Manager, Process

import numpy as np

from visual_foresight_tpu.agent.utils.traj_saver import record_worker
from visual_foresight_tpu.sim.benchmarks import perform_benchmark
from visual_foresight_tpu.sim.simulator import Sim
from visual_foresight_tpu.sim.util.combine_score import combine_scores
from visual_foresight_tpu.sim.util.synchronize_tfrecs import start_sync_thread
from visual_foresight_tpu.utils.sync import ManagedSyncCounter


def load_config(hyperparams_file):
    loader = importlib.machinery.SourceFileLoader('mod_hyper', hyperparams_file)
    spec = importlib.util.spec_from_loader(loader.name, loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    return mod.config


def use_worker(conf, iex=-1, ngpu=1):
    print('started process with PID:', os.getpid())
    print('making trajectories {0} to {1}'.format(conf['start_index'],
                                                  conf['end_index']))
    random.seed(None)
    np.random.seed(None)
    if conf.get('_do_benchmark', False):
        perform_benchmark(conf, iex, gpu_id=conf['gpu_id'], ngpu=ngpu)
    else:
        s = Sim(conf)
        s.run()


def check_and_pop(dict_, key):
    if dict_.pop(key, None) is not None:
        print('popping key: {}'.format(key))


def main(cmd_args=None):
    parser = argparse.ArgumentParser(description='run simulation experiments')
    parser.add_argument('experiment', type=str, help='path to hparams.py')
    parser.add_argument('--nworkers', type=int, default=1)
    parser.add_argument('--gpu_id', type=int, default=0,
                        help='accelerator id offset (kept for CLI compat)')
    parser.add_argument('--ngpu', type=int, default=1)
    parser.add_argument('--nsplit', type=int, default=-1)
    parser.add_argument('--isplit', type=int, default=-1)
    parser.add_argument('--cloud', action='store_true', default=False)
    parser.add_argument('--benchmark', dest='do_benchmark', action='store_true',
                        default=False)
    parser.add_argument('--iex', type=int, default=-1,
                        help='if != -1 only run this example')
    args = parser.parse_args(cmd_args)

    hyperparams_file = args.experiment
    assert os.path.isfile(hyperparams_file), 'hyperparams file does not exist!'

    n_worker = args.nworkers
    parallel = n_worker > 1
    print('parallel ', parallel)

    hyperparams = load_config(hyperparams_file)

    if args.nsplit != -1:
        assert 0 <= args.isplit < args.nsplit, 'isplit must be in [0, nsplit-1]'
        n_persplit = max((hyperparams['end_index'] + 1 -
                          hyperparams['start_index']) / args.nsplit, 1)
        hyperparams['end_index'] = int((args.isplit + 1) * n_persplit +
                                       hyperparams['start_index'] - 1)
        hyperparams['start_index'] = int(args.isplit * n_persplit +
                                         hyperparams['start_index'])

    n_traj = hyperparams['end_index'] - hyperparams['start_index'] + 1
    traj_per_worker = int(n_traj // np.float32(n_worker))
    start_idx = [hyperparams['start_index'] + traj_per_worker * i
                 for i in range(n_worker)]
    end_idx = [hyperparams['start_index'] + traj_per_worker * (i + 1) - 1
               for i in range(n_worker)]

    if 'gen_xml' in hyperparams['agent']:
        # remove stale auto-generated scene files
        for stale in glob.glob(os.path.join(
                os.path.dirname(hyperparams['agent'].get('filename', '')),
                'auto_gen', '*')):
            try:
                os.remove(stale)
            except OSError:
                pass

    result_dir = None
    if 'RESULT_DIR' in os.environ:
        if 'exp_name' in hyperparams:
            exp_name = hyperparams['exp_name']
        elif 'data_save_dir' in hyperparams['agent']:
            exp_path = hyperparams['agent']['data_save_dir'].split('/')
            exp_index = min(max([i for i, v in enumerate(exp_path)
                                 if v == 'experiments'] + [0]) + 1,
                            len(exp_path) - 1)
            exp_name = '/'.join(exp_path[exp_index:])
        elif 'record' in hyperparams['agent']:
            exp_name = [f for f in hyperparams['agent']['record'].split('/')
                        if f != 'record' and len(f) > 0][-1]
        else:
            raise NotImplementedError("can't find exp name")
        now = datetime.datetime.now()
        mode = 'experiments' if args.do_benchmark else 'traj_data'
        result_dir = '{}/{}/{}/exp_{}_{}_{}_{}_{}'.format(
            os.environ['RESULT_DIR'], mode, exp_name, now.year, now.month,
            now.day, now.hour, now.minute)
        os.makedirs(result_dir)
        shutil.copyfile(hyperparams_file, '{}/hparams.py'.format(result_dir))
        if 'verbose' in hyperparams['policy'] and \
                not os.path.exists(result_dir + '/verbose'):
            os.makedirs(result_dir + '/verbose')
        if 'data_save_dir' in hyperparams['agent']:
            hyperparams['agent']['data_save_dir'] = result_dir
    elif 'EXPERIMENT_DIR' in os.environ:
        subpath = hyperparams['current_dir'].partition('experiments')[2]
        result_dir = os.path.join(os.environ['EXPERIMENT_DIR'] + subpath)
    elif args.cloud:
        check_and_pop(hyperparams, 'save_raw_images')
        check_and_pop(hyperparams['agent'], 'make_final_gif')
        check_and_pop(hyperparams['agent'], 'make_final_gif_pointoverlay')
        hyperparams['agent']['data_save_dir'] = '/result/'
    else:
        result_dir = hyperparams['current_dir'] + '/verbose'

    if result_dir is not None:
        os.makedirs(result_dir, exist_ok=True)

    sync_stop = None
    if 'master_datadir' in hyperparams['agent']:
        sync_stop = start_sync_thread(hyperparams['agent'])
        print('launched sync thread')

    record_queue, record_saver_proc, counter = None, None, None
    if 'data_save_dir' in hyperparams['agent']:
        record_queue, record_saver_proc, counter = prepare_saver(hyperparams)

    if args.iex != -1:
        hyperparams['agent']['iex'] = args.iex

    conflist = []
    for i in range(n_worker):
        modconf = copy.deepcopy(hyperparams)
        modconf['start_index'] = start_idx[i]
        modconf['end_index'] = end_idx[i]
        modconf['ntraj'] = n_traj
        modconf['gpu_id'] = i + args.gpu_id
        modconf['result_dir'] = result_dir
        modconf['_do_benchmark'] = args.do_benchmark
        if record_queue is not None:
            modconf['record_saver'] = record_queue
            modconf['counter'] = counter
        conflist.append(modconf)

    if parallel:
        # plain (non-daemonic) processes: workers must be able to fork their
        # own file-saver children, which Pool's daemonic workers cannot
        procs = [Process(target=use_worker, args=(conf,)) for conf in conflist]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
    else:
        use_worker(conflist[0], args.iex, args.ngpu)

    if record_queue is not None and not hyperparams.get('save_raw_images', False):
        record_queue.put(None)  # saver drains then exits
        if record_saver_proc is not None:
            record_saver_proc.join()

    if sync_stop is not None:
        sync_stop.set()

    if args.do_benchmark:
        combine_scores(hyperparams, result_dir)
        return result_dir

    return result_dir


def prepare_saver(hyperparams):
    m = Manager()
    record_queue, synch_counter = m.Queue(), ManagedSyncCounter(m)
    save_dir = hyperparams['agent']['data_save_dir'] + '/records'
    T = hyperparams['agent']['T']
    if hyperparams.get('save_data', True) and \
            not hyperparams.get('save_raw_images', False):
        seperate_good = hyperparams.get('seperate_good', False)
        traj_per_file = hyperparams.get('traj_per_file', 16)
        record_saver_proc = Process(
            target=record_worker,
            args=(record_queue, save_dir, T, seperate_good, traj_per_file,
                  hyperparams['start_index']))
        record_saver_proc.start()
    else:
        record_saver_proc = None
    return record_queue, record_saver_proc, synch_counter


if __name__ == '__main__':
    main()
