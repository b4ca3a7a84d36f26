"""Qualitative predictor evaluation: ground-truth vs predicted rollout strips.

Loads a trained checkpoint, rolls trajectories from the validation set with
only the context frames + actions, and writes side-by-side png strips + gifs
(and prints per-step PSNR of the autoregressive rollout — the number that
actually matters for planning, unlike teacher-forced training PSNR).

CLI::

    python -m visual_foresight_tpu.training.visualize_predictions \
        --data_dir <records> --model_dir <ckpts> [--n 4 --out_dir preds]
"""

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from visual_foresight_tpu.prediction import checkpoints
from visual_foresight_tpu.training.train_predictor import (build_argparser,
                                                           build_model)


def main(cmd_args=None):
    parser = build_argparser()
    parser.add_argument('--n', type=int, default=4)
    parser.add_argument('--out_dir', type=str, default='pred_vis')
    parser.add_argument('--mode', type=str, default='val')
    args = parser.parse_args(cmd_args)
    if args.platform:
        # must land before first jax use — the axon plugin ignores
        # JAX_PLATFORMS (train_predictor.__main__ does the same)
        jax.config.update('jax_platforms', args.platform)

    model = build_model(args)
    key = jax.random.PRNGKey(0)
    h, w = args.image_height, args.image_width
    template = model.init(
        key, jnp.zeros((1, args.context_frames, h, w, 3)),
        jnp.zeros((1, args.sequence_length - 1, args.adim)),
        jnp.zeros((1, args.context_frames, args.sdim)))
    params = checkpoints.restore_params(
        os.path.join(args.model_dir, 'view0'), template=template)

    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(args.data_dir, args.n,
                          hparams_dict={'shuffle': False})
    batch = next(ds.numpy_iterator(keys=('images', 'actions', 'state'),
                                   mode=args.mode))
    T = args.sequence_length
    images = batch['images'][:, :T, 0].astype(np.float32) / 255.0
    actions = batch['actions'][:, :T - 1].astype(np.float32)
    states = batch['state'][:, :T].astype(np.float32)

    out = model.apply(params, jnp.asarray(images), jnp.asarray(actions),
                      jnp.asarray(states))
    pred = np.asarray(out['gen_images'])            # predicts frames 1..T-1
    gt = images[:, 1:]

    mse_t = np.mean(np.square(pred - gt), axis=(0, 2, 3, 4))
    psnr_t = -10 * np.log10(np.maximum(mse_t, 1e-10))
    n_ctx = args.context_frames
    report = {
        'psnr_per_step': [round(float(p), 2) for p in psnr_t],
        'psnr_context': round(float(np.mean(psnr_t[:n_ctx - 1])), 2)
        if n_ctx > 1 else None,
        'psnr_autoregressive': round(float(np.mean(psnr_t[n_ctx - 1:])), 2),
        'psnr_final_step': round(float(psnr_t[-1]), 2),
    }
    print(json.dumps(report))

    os.makedirs(args.out_dir, exist_ok=True)
    import cv2
    for b in range(pred.shape[0]):
        strip_gt = np.concatenate(list(gt[b]), axis=1)
        strip_pr = np.concatenate(list(pred[b]), axis=1)
        strip = np.concatenate([strip_gt, strip_pr], axis=0)
        cv2.imwrite(os.path.join(args.out_dir, 'traj{}.png'.format(b)),
                    (np.clip(strip, 0, 1) * 255).astype(np.uint8)[:, :, ::-1])
    print('wrote {} strips (top=ground truth, bottom=prediction) to {}'.format(
        pred.shape[0], args.out_dir))
    return report


if __name__ == '__main__':
    main()
