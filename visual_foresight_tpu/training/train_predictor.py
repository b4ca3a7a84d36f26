"""Video-predictor training.

The reference does NOT train its predictor — it serves pretrained TF1
SAVP/CDNA checkpoints from external repos (``README.md:5``).  This module
internalizes training as a first-class subsystem: scheduled-sampling
teacher forcing (Finn et al. 2016), L2+L1 reconstruction and state losses,
optax Adam with warmup-cosine schedule, orbax checkpoints, and data-parallel
scaling over a ``jax.sharding.Mesh`` (batch axis sharded; XLA inserts the
gradient all-reduce over ICI).

CLI::

    python -m visual_foresight_tpu.training.train_predictor \
        --data_dir <records dir> --model_dir <ckpt dir> [--steps N] ...
"""

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visual_foresight_tpu.models.cdna import CDNAPredictor
from visual_foresight_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                                replicate, replicated,
                                                shard_batch)
from visual_foresight_tpu.prediction import checkpoints


def scheduled_sampling_mask(key, step, T, batch, n_context, k=900.0):
    """Per-step probability of feeding ground truth; inverse-sigmoid decay
    (Finn et al.'s schedule): p = k / (k + exp(step / k))."""
    p = k / (k + jnp.exp(step / k))
    rand = jax.random.uniform(key, (batch, T))
    mask = (rand < p).astype(jnp.float32)
    # context steps are always teacher-forced (step t consumes frame t)
    ctx = (jnp.arange(T) < n_context).astype(jnp.float32)
    return jnp.maximum(mask, ctx[None])


def kl_beta_schedule(step, beta, anneal_start, anneal_end):
    """Linear KL-weight ramp 0 -> beta over [anneal_start, anneal_end]
    (SV2P trains the reconstruction path first, then turns the latent on —
    Babaeizadeh et al. 2018 §4)."""
    frac = (step - anneal_start) / jnp.maximum(anneal_end - anneal_start, 1.0)
    return beta * jnp.clip(frac, 0.0, 1.0)


def make_loss_fn(model, n_context, state_weight=1e-4, l1_weight=0.0,
                 ss_k=900.0, posterior=None, kl_beta=0.0,
                 kl_anneal=(0, 1), kl_free_nats=1.0):
    """Training loss.  With ``posterior`` set (a ``PosteriorEncoder``) the
    predictor trains as a variational model: the rollout conditions on the
    reparameterized posterior sample and the loss carries an annealed
    KL(q(z|x) || N(0,1)) — the semantics of the stochastic SAVP/SV2P models
    the reference serves (``vpred_model_interface.py:52-66``).  ``params``
    is then ``{'model': ..., 'posterior': ...}``."""
    def loss_fn(params, batch, rng, step):
        images = batch['images']          # (B, T+1, H, W, C) float [0,1] or u8
        if images.dtype == jnp.uint8:
            # fused device ingest: batches cross the wire as uint8 and the
            # cast/normalize fuses into the encoder's first conv under jit
            images = images.astype(jnp.float32) * (1.0 / 255.0)
        actions = batch['actions']        # (B, T, adim)
        states = batch['states']          # (B, T+1, sdim)
        B, Tp1 = images.shape[:2]
        T = Tp1 - 1

        rng_ss, rng_latent = jax.random.split(rng)
        gt_mask = scheduled_sampling_mask(rng_ss, step, T, B, n_context,
                                          k=ss_k)

        kl = None
        if posterior is not None:
            model_params = params['model']
            mu, log_var = posterior.apply(params['posterior'], images)
            z = mu + jnp.exp(0.5 * log_var) * \
                jax.random.normal(rng_latent, mu.shape)
            out = model.apply(model_params, images, actions, states,
                              distribs=None, gt_mask=gt_mask, latent=z)
            kl = 0.5 * jnp.mean(jnp.sum(
                jnp.exp(log_var) + jnp.square(mu) - 1.0 - log_var, axis=-1))
        else:
            out = model.apply(params, images, actions, states,
                              distribs=None, rng=rng_latent, gt_mask=gt_mask)
        pred = out['gen_images']          # (B, T, H, W, C) predicts frames 1..T
        target = images[:, 1:]
        l2 = jnp.mean(jnp.square(pred - target))
        loss = l2
        if l1_weight:
            loss = loss + l1_weight * jnp.mean(jnp.abs(pred - target))
        state_l2 = jnp.mean(jnp.square(out['gen_states'] - states[:, 1:]))
        loss = loss + state_weight * state_l2

        metrics = {'loss': loss, 'img_l2': l2, 'state_l2': state_l2,
                   'psnr': -10.0 * jnp.log10(jnp.maximum(l2, 1e-10))}
        if kl is not None:
            # free bits (SV2P / Kingma et al. 2016): KL below the floor is
            # free, so early reconstruction learning cannot collapse the
            # posterior onto the prior before the latent becomes useful
            beta = kl_beta_schedule(step, kl_beta, *kl_anneal)
            loss = loss + beta * jnp.maximum(kl - kl_free_nats, 0.0)
            metrics.update({'loss': loss, 'kl': kl, 'kl_beta': beta})
        return loss, metrics
    return loss_fn


def make_train_step(model, tx, n_context, **loss_kwargs):
    loss_fn = make_loss_fn(model, n_context, **loss_kwargs)

    def train_step(params, opt_state, batch, rng, step):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, step)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics['grad_norm'] = optax.global_norm(grads)
        return params, opt_state, metrics

    return train_step


def build_model(args):
    return CDNAPredictor(
        n_context=args.context_frames, num_masks=args.num_masks,
        kernel_size=args.cdna_kernel_size, sna=not args.no_sna,
        latent_dim=args.latent_dim, num_distribs=0, sdim=args.sdim,
        adim=args.adim, lstm_kernel=args.lstm_kernel,
        separable_lstm=args.separable_lstm,
        std_factor=args.std_factor,
        enc_features=tuple(args.enc_features),
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)


def init_params(model, args, seed=0):
    key = jax.random.PRNGKey(seed)
    h, w = args.image_height, args.image_width
    imgs = jnp.zeros((1, args.context_frames, h, w, 3))
    acts = jnp.zeros((1, args.sequence_length - 1, args.adim))
    states = jnp.zeros((1, args.context_frames, args.sdim))
    return model.init(key, imgs, acts, states)


def synthetic_batches(args, seed=0):
    """Deterministic synthetic data for smoke training (moving square)."""
    rng = np.random.RandomState(seed)
    h, w = args.image_height, args.image_width
    T = args.sequence_length
    while True:
        imgs = np.zeros((args.batch_size, T, h, w, 3), np.float32)
        actions = rng.uniform(-1, 1, (args.batch_size, T - 1,
                                      args.adim)).astype(np.float32) * 0.5
        states = np.zeros((args.batch_size, T, args.sdim), np.float32)
        for b in range(args.batch_size):
            r, c = rng.randint(2, h - 6), rng.randint(2, w - 6)
            color = rng.rand(3)
            for t in range(T):
                imgs[b, t] = 0.1
                imgs[b, t, r:r + 4, c:c + 4] = color
                states[b, t, :2] = [r / h, c / w]
                if t < T - 1:
                    r = int(np.clip(r + round(actions[b, t, 0] * 4), 0, h - 5))
                    c = int(np.clip(c + round(actions[b, t, 1 % args.adim] * 4),
                                    0, w - 5))
        yield {'images': imgs, 'actions': actions, 'states': states}


def record_batches(args):
    """Batches from collected TFRecords or RoboNet-format HDF5.

    TFRecord dirs (detected by ``manifest.pkl``) go through the fused-ingest
    pipeline (``data/fused_ingest.py``): native C++ decode on the host,
    uint8 across the wire, normalize fused into the jitted step; ``--loader
    python`` forces the threaded pure-Python reader.  Directories holding
    HDF5 trajectories (RoboNet traj-per-file or the bucketed HDF5Saver
    layout) go through ``data/robonet_reader``, feeding the same uint8
    device-ingest path."""
    if not os.path.isfile(os.path.join(args.data_dir, 'manifest.pkl')):
        from visual_foresight_tpu.data.robonet_reader import RoboNetTrajReader
        loader = RoboNetTrajReader(args.data_dir, args.batch_size,
                                   sequence_length=args.sequence_length,
                                   seed=args.seed)
    else:
        from visual_foresight_tpu.data import fused_ingest
        prefer_native = args.loader != 'python'
        loader = fused_ingest.make_loader(
            args.data_dir, args.batch_size, prefer_native=prefer_native,
            threads=args.loader_threads, seed=args.seed)
    for batch in loader:
        images = batch['images']          # (B, T, ncam, H, W, 3) uint8
        cam = min(args.camera, images.shape[2] - 1)
        yield {
            'images': np.ascontiguousarray(
                images[:, :args.sequence_length, cam]),
            'actions': batch['actions'][:, :args.sequence_length - 1]
            .astype(np.float32),
            'states': batch['state'][:, :args.sequence_length]
            .astype(np.float32),
        }


def _fast_forward_count(opt_state, step):
    """Set every integer ``count`` leaf in an optax state to ``step`` so a
    resumed schedule continues where it left off."""
    def bump(x):
        if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.integer) \
                and np.ndim(x) == 0:
            return jnp.asarray(step, x.dtype)
        return x
    return jax.tree.map(bump, opt_state)


def model_config_dict(args):
    """The architecture hparams a serving-side ``TPUPredictor`` needs to
    rebuild this exact model (recorded next to the checkpoints so the
    train/serve boundary cannot drift — see ``predictor.restore``)."""
    return {
        'context_frames': args.context_frames,
        'num_masks': args.num_masks,
        'kernel_size': args.cdna_kernel_size,
        'sna': not args.no_sna,
        'dna': False,
        'latent_dim': args.latent_dim,
        'lstm_kernel': args.lstm_kernel,
        'separable_lstm': args.separable_lstm,
        'std_factor': args.std_factor,
        'enc_features': list(args.enc_features),
        'dtype': 'bfloat16' if args.bf16 else 'float32',
        'adim': args.adim,
        'sdim': args.sdim,
        'sequence_length': args.sequence_length,
        'img_dims': [args.image_height, args.image_width],
        # provenance only — planning samples the latent from the prior, so
        # serving needs no posterior parameters
        'stochastic': bool(args.stochastic),
    }


def build_posterior(args):
    from visual_foresight_tpu.models.latent import PosteriorEncoder
    return PosteriorEncoder(
        latent_dim=args.latent_dim,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32)


def train(args):
    model = build_model(args)
    params = init_params(model, args)
    start_step = 0

    posterior = None
    if args.stochastic:
        if args.latent_dim <= 0:
            raise ValueError('--stochastic requires --latent_dim > 0')
        posterior = build_posterior(args)
        post_params = posterior.init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, args.sequence_length, args.image_height,
                       args.image_width, 3)))
        params = {'model': params, 'posterior': post_params}

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(200, args.steps // 10 + 1),
        decay_steps=max(args.steps, 2))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(schedule, weight_decay=1e-5))
    opt_state = tx.init(params)

    if args.resume and args.model_dir:
        view_dir = os.path.join(args.model_dir, 'view0')
        latest = checkpoints.latest_checkpoint(view_dir)
        if latest:
            start_step = int(latest.rsplit('_', 1)[1])
            if args.stochastic:
                # serving checkpoints (view0) hold just the generative model;
                # the training-only posterior tower lives beside them
                params = {
                    'model': checkpoints.restore_params(
                        view_dir, template=params['model'], step=start_step),
                    'posterior': checkpoints.restore_params(
                        os.path.join(args.model_dir, 'posterior'),
                        template=params['posterior'], step=start_step),
                }
            else:
                params = checkpoints.restore_params(view_dir, template=params)
            opt_dir = os.path.join(args.model_dir, 'opt')
            try:
                opt_state = checkpoints.restore_params(
                    opt_dir, template=opt_state, step=start_step)
                print('resumed opt state at step {}'.format(start_step))
            except FileNotFoundError:
                # legacy checkpoint without optimizer state: keep Adam fresh
                # but fast-forward the schedule so the LR is continuous
                opt_state = _fast_forward_count(opt_state, start_step)
                print('WARNING: no saved opt state; Adam moments reset, '
                      'schedule fast-forwarded to step {}'.format(start_step))
            print('resumed from {} (step {})'.format(latest, start_step))

    if args.model_dir:
        os.makedirs(args.model_dir, exist_ok=True)
        with open(os.path.join(args.model_dir, 'model_config.json'), 'w') as f:
            json.dump(model_config_dict(args), f, indent=1)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    print('model params:', n_params)

    mesh = make_mesh(args.n_devices if args.n_devices > 0 else None)
    bsh = batch_sharding(mesh)
    rsh = replicated(mesh)

    kl_anneal = (float(args.kl_anneal_start if args.kl_anneal_start >= 0
                       else args.steps // 4),
                 float(args.kl_anneal_end if args.kl_anneal_end >= 0
                       else args.steps // 2))
    train_step = jax.jit(
        make_train_step(model, tx, args.context_frames,
                        state_weight=args.state_weight,
                        l1_weight=args.l1_weight, ss_k=args.ss_k,
                        posterior=posterior, kl_beta=args.kl_beta,
                        kl_anneal=kl_anneal,
                        kl_free_nats=args.kl_free_nats),
        in_shardings=(rsh, rsh, bsh, rsh, rsh),
        out_shardings=(rsh, rsh, rsh),
        donate_argnums=(0, 1))

    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)

    batches = record_batches(args) if args.data_dir else synthetic_batches(args)
    rng = jax.random.PRNGKey(args.seed)

    t0 = time.time()
    history = []
    for step in range(start_step, args.steps):
        batch = next(batches)
        batch = shard_batch(mesh, {k: jnp.asarray(v) for k, v in batch.items()})
        rng, sub = jax.random.split(rng)
        sub = jax.device_put(sub, rsh)
        params, opt_state, metrics = train_step(
            params, opt_state, batch, sub, jnp.asarray(step, jnp.float32))
        if step % args.log_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m['step'] = step
            m['sec'] = round(time.time() - t0, 1)
            history.append(m)
            # flush=True: over the remote-TPU tunnel the float() fetch above
            # is the loop's only real sync point, so an unflushed line makes
            # an externally-monitored run look wedged (or hides where a real
            # wedge happened) under block-buffered redirection
            print(json.dumps(m), flush=True)
        if args.model_dir and args.ckpt_every and \
                step > 0 and step % args.ckpt_every == 0:
            _save_all(args, params, opt_state, step)

    if args.model_dir:
        path = _save_all(args, params, opt_state, args.steps)
        print('saved final checkpoint to', path)
    return history, params


def _save_all(args, params, opt_state, step):
    """Write the serving checkpoint (view0), the training-only posterior
    tower (stochastic runs), and the optimizer state."""
    params = jax.device_get(params)
    if args.stochastic:
        path = checkpoints.save_params(
            params['model'], os.path.join(args.model_dir, 'view0'), step)
        checkpoints.save_params(
            params['posterior'], os.path.join(args.model_dir, 'posterior'),
            step)
    else:
        path = checkpoints.save_params(
            params, os.path.join(args.model_dir, 'view0'), step)
    checkpoints.save_params(jax.device_get(opt_state),
                            os.path.join(args.model_dir, 'opt'), step)
    return path


def build_argparser():
    p = argparse.ArgumentParser(description='train the CDNA video predictor')
    p.add_argument('--data_dir', type=str, default='',
                   help='TFRecords dir (default: synthetic data)')
    p.add_argument('--model_dir', type=str, default='')
    p.add_argument('--steps', type=int, default=1000)
    p.add_argument('--batch_size', type=int, default=16)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--sequence_length', type=int, default=15)
    p.add_argument('--context_frames', type=int, default=2)
    p.add_argument('--image_height', type=int, default=48)
    p.add_argument('--image_width', type=int, default=64)
    p.add_argument('--adim', type=int, default=3)
    p.add_argument('--sdim', type=int, default=3)
    p.add_argument('--num_masks', type=int, default=10)
    p.add_argument('--cdna_kernel_size', type=int, default=5)
    p.add_argument('--latent_dim', type=int, default=0)
    p.add_argument('--stochastic', action='store_true', default=False,
                   help='variational training (SV2P semantics): posterior '
                        'encoder over the trajectory + annealed KL; the '
                        'latent then genuinely carries future information '
                        'instead of being prior noise the L2 learns to '
                        'ignore')
    p.add_argument('--kl_beta', type=float, default=1e-4,
                   help='final KL weight (per-sequence nats vs mean-pixel '
                        'L2: 1e-4 weights ~10 nats on par with 1e-3 image '
                        'loss)')
    p.add_argument('--kl_anneal_start', type=int, default=-1,
                   help='step where the KL ramp starts (-1: steps/4)')
    p.add_argument('--kl_anneal_end', type=int, default=-1,
                   help='step where beta reaches kl_beta (-1: steps/2)')
    p.add_argument('--kl_free_nats', type=float, default=1.0,
                   help='free-bits floor: KL below this costs nothing, '
                        'preventing early posterior collapse')
    p.add_argument('--lstm_kernel', type=int, default=5)
    # default matches the serving-side flagship (prediction/predictor.py
    # DEFAULT_HPARAMS); checkpoints also record model_config.json so the
    # predictor adopts whatever was trained even if flags drift
    p.add_argument('--separable_lstm', action='store_true', default=True)
    p.add_argument('--dense_lstm', dest='separable_lstm',
                   action='store_false',
                   help='dense 5x5 conv-LSTM gates (strict Finn-CDNA parity)')
    p.add_argument('--no_sna', action='store_true')
    p.add_argument('--std_factor', type=int, default=0,
                   help='>0: space-to-depth backbone at (H/r, W/r) — the '
                        'TPU serving flagship uses 4 (see models/cdna.py '
                        '_backbone_std)')
    p.add_argument('--enc_features', type=int, nargs=3, default=(32, 64, 128),
                   help='feature widths; the r=4 flagship uses 128 256 256')
    p.add_argument('--bf16', action='store_true')
    p.add_argument('--state_weight', type=float, default=1e-4)
    p.add_argument('--ss_k', type=float, default=900.0,
                   help='scheduled-sampling decay constant; p(gt) = '
                        'k/(k+exp(step/k)) — match to the step budget')
    p.add_argument('--l1_weight', type=float, default=0.0)
    p.add_argument('--camera', type=int, default=0)
    p.add_argument('--loader', choices=('fused', 'python'), default='fused',
                   help='fused: native C++ ingest + in-jit normalize; '
                        'python: threaded pure-Python reader')
    p.add_argument('--loader_threads', type=int, default=2)
    p.add_argument('--n_devices', type=int, default=-1)
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--log_every', type=int, default=20)
    p.add_argument('--ckpt_every', type=int, default=0)
    p.add_argument('--resume', action='store_true', default=False,
                   help='resume from the latest checkpoint in model_dir')
    p.add_argument('--platform', type=str, default='',
                   help="force a JAX platform (e.g. 'cpu' for smoke runs); "
                        'needed because the axon TPU plugin ignores the '
                        'JAX_PLATFORMS env var')
    return p


if __name__ == '__main__':
    _args = build_argparser().parse_args()
    if _args.platform:
        jax.config.update('jax_platforms', _args.platform)
    train(_args)
