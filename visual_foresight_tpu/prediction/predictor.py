"""Predictor serving layer — the reference-shaped interface around the jitted
CDNA rollout.

Replaces the multi-GPU TF1 tower server (``visual_mpc/video_prediction/
setup_predictor.py:61-202``): instead of slicing the CEM batch across GPU
towers and concatenating fetches, ONE jitted program rolls the whole batch on
the TPU chip (optionally sharded over a device mesh, see ``parallel/mesh.py``).

``TPUPredictor`` implements the calling convention controllers expect
(``pixel_cost_controller.py:76-86``)::

    predictor = TPUPredictor(model_path, {'designated_pixel_count': 1,
                                          'run_batch_size': 200, ...})
    predictor.restore()
    out = predictor({'context_frames': ..., 'context_actions': ...,
                     'context_pixel_distributions': ..., 'context_states': ...},
                    {'actions': actions})
    out['predicted_frames']                # (M, T', ncam, H, W, 3) float32
    out['predicted_pixel_distributions']   # (M, T', ncam, H, W, P)
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from visual_foresight_tpu.models.cdna import CDNAPredictor
from visual_foresight_tpu.prediction import checkpoints


DEFAULT_HPARAMS = {
    'designated_pixel_count': 1,
    'run_batch_size': 200,
    'sequence_length': 15,
    'context_frames': 2,
    'ncam': 1,
    'img_dims': (48, 64),
    'adim': 3,
    'sdim': 3,
    'num_masks': 10,
    'kernel_size': 5,
    'sna': True,
    'dna': False,
    'latent_dim': 0,            # >0 for the stochastic (SAVP-style) variant
    'dtype': 'bfloat16',        # compute dtype on TPU
    # flagship TPU configuration: depthwise-separable conv-LSTM gates (the
    # dense 5x5 gates are ~90% of model FLOPs and bound replan latency; set
    # False for strict Finn-CDNA architectural parity)
    'separable_lstm': True,
    'lstm_kernel': 5,
    # space-to-depth backbone (models/cdna.py _backbone_std): the whole
    # conv-LSTM stack runs at (H/r, W/r) with >=128-channel, lane-aligned
    # matmul shapes; 0 = classic 3-scale Finn topology.  The serving
    # flagship is r=4 with wide features (set enc_features accordingly).
    'std_factor': 0,
    'enc_features': (32, 64, 128),
    # serving skips the per-step distribution renorm (all cost paths
    # normalize at cost time, matching reference semantics); training keeps
    # it for loss stability
    'renorm_distribs': False,
    # fused VMEM warp kernel (ops/pallas_cdna.py): verified against the
    # XLA path, but OPT-IN - the remote Mosaic compile service on this
    # dev box is unreliable; the XLA path is within ~1 ms/step of it
    'use_pallas_warp': False,
    # plan-mode warp tail in space-to-depth coordinates (bit-identical
    # arithmetic, lane-packed shapes — see ops/cdna_warp.dna_warp_s2d).
    # OPT-IN: measured 238 ms/replan vs 45 ms for the full-res tail on the
    # real chip (the K*K concat-shifted block copies swamp HBM; XLA tiles
    # the full-res elementwise taps far better than the 6-D block layout)
    's2d_tail': False,
    # XLA unroll of the plan-mode time scan (serving only): >1 trades
    # compile time for fewer loop trips and cross-step fusion
    'scan_unroll': 1,
    # std-backbone mask softmax placement: 'fullres' is the serving default
    # (identical math, kills ~108 us/step of layout copies on v5e); training
    # and the classic backbone ignore it
    'mask_softmax': 'fullres',
    # std-backbone decode-path composition (dec1 + d2s + dec1_gates as one
    # matmul at the H/(2r) grid) — identical params, fp-reassociation-level
    # output change; OPT-IN pending a full-replan measurement on the real
    # chip (see docs/PERFORMANCE.md 'measured dead ends' for why isolated
    # wins are not trusted)
    'fuse_decode': False,
}


class TPUPredictor:
    """Serves an action-conditioned video predictor as one device program."""

    def __init__(self, model_path, hparams=None, n_gpus=1, first_gpu=0,
                 model_kwargs=None):
        # n_gpus/first_gpu kept for ctor compatibility with the reference
        # controllers; device placement is handled by JAX/shardings.
        # Ensemble controllers pass a LIST of member checkpoint dirs; all
        # members share one architecture, so this predictor serves as the
        # first member and the model config is read from its dir (the
        # ensemble controller restores the remaining members itself).
        if isinstance(model_path, (list, tuple)) and model_path:
            model_path = model_path[0]
        self._model_path = model_path
        hp = dict(DEFAULT_HPARAMS)
        hp.update(hparams or {})
        self._hp = hp

        dtype = jnp.bfloat16 if hp['dtype'] == 'bfloat16' else jnp.float32
        self.model = CDNAPredictor(
            n_context=hp['context_frames'],
            num_masks=hp['num_masks'],
            kernel_size=hp['kernel_size'],
            sna=hp['sna'], dna=hp['dna'],
            latent_dim=hp['latent_dim'],
            num_distribs=hp['designated_pixel_count'],
            sdim=hp['sdim'], adim=hp['adim'], dtype=dtype,
            lstm_kernel=hp['lstm_kernel'],
            separable_lstm=hp['separable_lstm'],
            use_pallas_warp=hp['use_pallas_warp'],
            std_factor=hp['std_factor'],
            enc_features=tuple(hp['enc_features']),
            renorm_distribs=hp['renorm_distribs'],
            s2d_tail=hp['s2d_tail'],
            scan_unroll=hp['scan_unroll'],
            mask_softmax=hp['mask_softmax'],
            fuse_decode=hp['fuse_decode'],
            **(model_kwargs or {}))

        self.params = None          # list: one pytree per camera
        self._forward = None

    # -- reference-visible attributes ------------------------------------------------
    @property
    def n_context(self):
        return self._hp['context_frames']

    @property
    def sequence_length(self):
        return self._hp['sequence_length']

    @property
    def n_cam(self):
        return self._hp['ncam']

    @property
    def horizon(self):
        return self._hp['sequence_length'] - self._hp['context_frames']

    def _init_params(self, seed=0):
        h, w = self._hp['img_dims']
        n_ctx = self._hp['context_frames']
        key = jax.random.PRNGKey(seed)
        imgs = jnp.zeros((1, n_ctx, h, w, 3))
        acts = jnp.zeros((1, self.sequence_length - 1, self._hp['adim']))
        states = jnp.zeros((1, n_ctx, self._hp['sdim']))
        distribs = jnp.zeros((1, n_ctx, h, w,
                              self._hp['designated_pixel_count']))
        return self.model.init(key, imgs, acts, states, distribs)

    # architecture keys that must match the checkpoint; everything else in
    # the hparams dict is a serving-side choice
    _ARCH_KEYS = ('context_frames', 'num_masks', 'kernel_size', 'sna', 'dna',
                  'latent_dim', 'lstm_kernel', 'separable_lstm', 'adim',
                  'sdim', 'std_factor', 'enc_features')

    def _apply_model_config(self):
        """If the training run recorded a ``model_config.json`` next to the
        checkpoints, rebuild the model from it — the train/serve boundary
        must not depend on both sides passing matching flags (the reference
        read ``model_hparams.json`` from the checkpoint dir the same way,
        ``vpred_model_interface.py:18-24``)."""
        import json
        cfg_path = os.path.join(str(self._model_path), 'model_config.json')
        if not os.path.isfile(cfg_path):
            return
        with open(cfg_path) as f:
            cfg = json.load(f)
        if 'enc_features' in cfg:
            cfg['enc_features'] = tuple(cfg['enc_features'])
        self._hp['enc_features'] = tuple(self._hp['enc_features'])
        changed = {k: cfg[k] for k in self._ARCH_KEYS
                   if k in cfg and cfg[k] != self._hp[k]}
        if not changed:
            return
        print('predictor: adopting model config from checkpoint dir '
              '({})'.format(changed))
        self._hp.update(changed)
        dtype = (jnp.bfloat16 if self._hp['dtype'] == 'bfloat16'
                 else jnp.float32)
        self.model = CDNAPredictor(
            n_context=self._hp['context_frames'],
            num_masks=self._hp['num_masks'],
            kernel_size=self._hp['kernel_size'],
            sna=self._hp['sna'], dna=self._hp['dna'],
            latent_dim=self._hp['latent_dim'],
            num_distribs=self._hp['designated_pixel_count'],
            sdim=self._hp['sdim'], adim=self._hp['adim'], dtype=dtype,
            lstm_kernel=self._hp['lstm_kernel'],
            separable_lstm=self._hp['separable_lstm'],
            use_pallas_warp=self._hp['use_pallas_warp'],
            std_factor=self._hp['std_factor'],
            enc_features=tuple(self._hp['enc_features']),
            renorm_distribs=self._hp['renorm_distribs'],
            s2d_tail=self._hp['s2d_tail'],
            scan_unroll=self._hp['scan_unroll'],
            mask_softmax=self._hp['mask_softmax'],
            fuse_decode=self._hp['fuse_decode'])

    @staticmethod
    def _latest_tf1_prefix(view_dir):
        """Highest-step TF1 bundle prefix (``model-<N>.index``) in view_dir,
        or None — the reference's latest-iteration glob applied to TF1
        checkpoints (``setup_predictor.py:12-28``)."""
        import glob as globlib
        best, best_step = None, -1
        for idx in globlib.glob(os.path.join(view_dir, '*.index')):
            prefix = idx[:-len('.index')]
            digits = ''.join(ch for ch in prefix.rsplit('-', 1)[-1]
                             if ch.isdigit())
            step = int(digits) if digits else 0
            if step > best_step:
                best, best_step = prefix, step
        return best

    def restore(self):
        """Load per-camera params from model_path (one subdir per view:
        ``view0/``, ``view1/`` …).  Each view dir may hold orbax step dirs or
        a TF1 TensorBundle (``model-<N>.index`` + data shards) — the latter
        is imported TF-free via ``tf1_import`` with the reference's
        suffix-matching semantics.  Missing checkpoints fall back to randomly
        initialized params with a loud warning (useful for benchmarking the
        compute path before training finishes)."""
        self._apply_model_config()
        template = self._init_params()
        self.params = []
        self.restored = True
        for c in range(self.n_cam):
            view_dir = os.path.join(str(self._model_path), 'view{}'.format(c))
            tf1_prefix = self._latest_tf1_prefix(view_dir)
            try:
                if tf1_prefix is not None:
                    from . import tf1_import
                    params, report = tf1_import.import_tf1_checkpoint(
                        tf1_prefix, template)
                    print('imported TF1 checkpoint {} ({} tensors)'.format(
                        tf1_prefix, len(report['matched'])))
                else:
                    params = checkpoints.restore_params(view_dir,
                                                        template=template)
                    print('restored predictor params from {}'.format(view_dir))
            except (FileNotFoundError, Exception) as e:  # noqa: B902
                if isinstance(e, FileNotFoundError):
                    print('WARNING: no checkpoint at {}; using random init'
                          .format(view_dir))
                    params = self._init_params(seed=c)
                    self.restored = False
                else:
                    raise
            self.params.append(params)
        self._build_forward()
        return self

    def set_params(self, params_per_cam):
        self.params = list(params_per_cam)
        self._build_forward()
        return self

    def _build_forward(self):
        model = self.model
        n_ctx = self.n_context

        @partial(jax.jit, static_argnums=())
        def forward(params_list, images, states, distribs, actions, rng):
            # images: (ncam, n_ctx, H, W, C); actions: (M, T, adim)
            M = actions.shape[0]
            gen_i, gen_d = [], []
            for c, p in enumerate(params_list):
                imgs = jnp.broadcast_to(images[c][None], (M,) + images[c].shape)
                dstr = jnp.broadcast_to(distribs[c][None],
                                        (M,) + distribs[c].shape)
                sts = jnp.broadcast_to(states[None], (M,) + states.shape)
                out = model.apply(p, imgs, actions, sts, dstr, rng=rng)
                gen_i.append(out['gen_images'][:, n_ctx - 1:])
                gen_d.append(out['gen_distribs'][:, n_ctx - 1:])
            return jnp.stack(gen_i, axis=2), jnp.stack(gen_d, axis=2)

        self._forward = forward

    # -- reference calling convention ---------------------------------------------
    def __call__(self, context, action_dict, rng=None):
        """
        :param context: dict with 'context_frames' (n_ctx, ncam, H, W, 3)
            float [0,1] (or (1, n_ctx, ncam, ...)), 'context_actions'
            (>= n_ctx-1, adim) — the executed actions, the last n_ctx-1 of
            which fall between the context frames — 'context_states'
            (n_ctx, sdim) and 'context_pixel_distributions'
            (n_ctx, ncam, H, W, P)
        :param action_dict: {'actions': (M, T_plan, adim)} candidate plans
        :return: dict of numpy arrays 'predicted_frames'
            (M, T', ncam, H, W, 3) and 'predicted_pixel_distributions'
            (M, T', ncam, H, W, P)
        """
        if self.params is None:
            raise RuntimeError('call restore() first')

        frames = np.asarray(context['context_frames'], np.float32)
        if frames.ndim == 6:
            frames = frames[0]
        distribs = np.asarray(context['context_pixel_distributions'], np.float32)
        if distribs.ndim == 6:
            distribs = distribs[0]
        states = np.asarray(context['context_states'], np.float32)
        if states.ndim == 3:
            states = states[0]
        states = states[-self.n_context:]

        chosen = np.asarray(context.get('context_actions',
                                        np.zeros((self.n_context - 1,
                                                  self._hp['adim']))),
                            np.float32)
        ctx_actions = chosen[-(self.n_context - 1):] if self.n_context > 1 \
            else chosen[:0]

        # (n_ctx, ncam, ...) -> (ncam, n_ctx, ...)
        frames_cam = np.swapaxes(frames[-self.n_context:], 0, 1)
        distribs_cam = np.swapaxes(distribs[-self.n_context:], 0, 1)

        actions = np.asarray(action_dict['actions'], np.float32)
        M = actions.shape[0]
        full_actions = np.concatenate(
            [np.tile(ctx_actions[None], (M, 1, 1)), actions], axis=1)

        if rng is None:
            rng = jax.random.PRNGKey(0)

        gen_i, gen_d = self._forward(self.params, jnp.asarray(frames_cam),
                                     jnp.asarray(states),
                                     jnp.asarray(distribs_cam),
                                     jnp.asarray(full_actions), rng)
        return {
            'predicted_frames': np.asarray(gen_i, np.float32),
            'predicted_pixel_distributions': np.asarray(gen_d, np.float32),
        }
