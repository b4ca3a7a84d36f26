"""Goal-registration CEM controller
(reference ``register_gtruth_controller.py``).

Before each replan, the GDN flow net warps the CURRENT frame onto the start
and goal images.  The flow at the designated/goal pixels relocates the
designated pixels (tracking the object without hand annotation); warp errors
around those pixels become per-(camera, task, start/goal) confidence
tradeoffs that weight the pixel-distance cost.
"""

import numpy as np

import jax
import jax.numpy as jnp

from visual_foresight_tpu.models.gdn import GoalDistanceNet
from visual_foresight_tpu.planners import costs as cost_lib
from visual_foresight_tpu.prediction import checkpoints
from .pixel_cost_controller import PixelCostController


class RegisterGtruthController(PixelCostController):
    def __init__(self, ag_params, policyparams, gpu_id=0, ngpu=1):
        pp = dict(policyparams)
        num_reg = len(pp.get('register_gtruth', ['start', 'goal']))
        # each task is scored against both its start- and goal-registered
        # designated pixel, so the predictor carries ntask*num_reg distribs
        self._ntask = ag_params.get('ntask', 1)
        pp.setdefault('designated_pixel_count', self._ntask * num_reg)
        super().__init__(ag_params, pp, gpu_id, ngpu)

        self._num_reg = num_reg
        self.reg_tradeoff = np.ones([self._n_cam, self._n_desig]) \
            / self._n_cam / self._n_desig

        self.gdn = GoalDistanceNet()
        self.gdn_params = self._restore_gdn()
        self._gdn_apply = jax.jit(
            lambda p, cur, ref: self.gdn.apply(p, cur, ref))

        self._start_image = None
        self._goal_image = None
        self._desig_pix_t0 = None

    def _restore_gdn(self):
        template = self.gdn.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self._img_height, self._img_width, 3)),
            jnp.zeros((1, self._img_height, self._img_width, 3)))
        if self._hp.gdn_path:
            try:
                return checkpoints.restore_params(self._hp.gdn_path,
                                                  template=template)
            except FileNotFoundError:
                print('WARNING: no GDN checkpoint at {}; random init'.format(
                    self._hp.gdn_path))
        return template

    def _default_hparams(self):
        parent_params = super()._default_hparams()
        parent_params.add_hparam('register_gtruth', ['start', 'goal'])
        parent_params.add_hparam('register_region', False)
        parent_params.add_hparam('gdn_path', '')
        return parent_params

    # -- registration -------------------------------------------------------------
    def _register(self, current_frames):
        """Warp current frame (per cam) onto start/goal; returns
        (desig (ncam, ndesig, 2), tradeoff (ncam, ndesig))."""
        width = 5 if self._img_height >= 96 else 2
        desig = np.zeros((self._n_cam, self._ntask, self._num_reg, 2))
        warperrs = np.zeros((self._n_cam, self._ntask, self._num_reg))

        refs = []
        if 'start' in self._hp.register_gtruth:
            refs.append(('start', self._start_image))
        if 'goal' in self._hp.register_gtruth:
            refs.append(('goal', self._goal_image))

        for icam in range(self._n_cam):
            cur = jnp.asarray(current_frames[icam][None])
            for r, (name, ref_imgs) in enumerate(refs):
                ref = jnp.asarray(ref_imgs[icam][None])
                warped, flow, warp_pts = self._gdn_apply(self.gdn_params,
                                                         cur, ref)
                warped = np.asarray(warped[0])
                warp_pts = np.asarray(warp_pts[0])
                ref_np = np.asarray(ref[0])
                for p in range(self._ntask):
                    if name == 'start':
                        pix = self._desig_pix_t0[icam, p]
                    else:
                        pix = self._goal_pix_sel[icam, p]
                    r_rng = np.clip([pix[0] - width, pix[0] + width + 1], 0,
                                    self._img_height - 1).astype(int)
                    c_rng = np.clip([pix[1] - width, pix[1] + width + 1], 0,
                                    self._img_width - 1).astype(int)
                    warperrs[icam, p, r] = np.mean(np.square(
                        ref_np[r_rng[0]:r_rng[1], c_rng[0]:c_rng[1]] -
                        warped[r_rng[0]:r_rng[1], c_rng[0]:c_rng[1]])) + 1e-6
                    if self._hp.register_region:
                        field = warp_pts[r_rng[0]:r_rng[1], c_rng[0]:c_rng[1]]
                        desig[icam, p, r] = [np.median(field[:, :, 0]),
                                             np.median(field[:, :, 1])]
                    else:
                        desig[icam, p, r] = warp_pts[int(pix[0]), int(pix[1])]

        tradeoff = 1.0 / warperrs
        normalizer = np.sum(np.sum(tradeoff, 0, keepdims=True), 2,
                            keepdims=True)
        tradeoff = (tradeoff / normalizer).reshape(self._n_cam, self._n_desig)
        desig = desig.reshape(self._n_cam, self._n_desig, 2)
        return desig, tradeoff

    def perform_CEM(self, state):
        # refresh designated pixels + tradeoffs from the registration
        current = self._images[-1].astype(np.float32) / 255.0   # (ncam,H,W,3)
        desig, tradeoff = self._register(current)
        self._desig_pix = np.clip(
            np.round(desig), 0,
            [[[self._img_height - 1, self._img_width - 1]]]).astype(np.int64)
        self.reg_tradeoff = tradeoff
        self.plan_stat['tradeoff'] = tradeoff
        super().perform_CEM(state)

    def _cost_grids(self):
        """Tradeoff-weighted distance grids for the fused planner: the
        expected-pixel-distance cost is linear in the grid, so scaling each
        (cam, desig) grid by its registration confidence reproduces the
        host path's weighted sum (``_eval_pixel_cost``) exactly —
        normalization differs only by the constant n_cam*n_desig factor,
        which CEM ranking is invariant to."""
        grids = super()._cost_grids()                       # (ncam, P, H, W)
        w = jnp.asarray(self.reg_tradeoff * self._n_cam * self._n_desig,
                        grids.dtype)
        return grids * w[:, :, None, None]

    def _eval_pixel_cost(self, cem_itr, gen_distrib, gen_images):
        """Weighted variant: per-(cam, desig) scores blended by reg tradeoff."""
        grids = np.asarray(cost_lib.distance_grid(
            self._goal_pix.reshape(self._n_cam, self._n_desig, 2),
            self._img_height, self._img_width))
        d = gen_distrib.astype(np.float32)
        tot = d.sum(axis=(3, 4), keepdims=True)
        d = d / np.maximum(tot, 1e-6)
        per_t = np.einsum('btchwp,cphw->btcp', d, grids)
        w = np.ones(per_t.shape[1], np.float32)
        w[-1] = self._hp.finalweight
        per_task = np.sum(per_t * w[None, :, None, None], axis=1) / w.sum()
        weighted = per_task * self.reg_tradeoff[None]
        return weighted.reshape(weighted.shape[0], -1).sum(axis=1)

    def act(self, t=None, i_tr=None, desig_pix=None, goal_pix=None,
            images=None, goal_image=None, state=None, verbose_worker=None):
        # multi-object scenes pass pixels for every object; plan for the
        # first ntask of them (same convention as PixelCostController.act)
        self._goal_pix_sel = np.array(goal_pix).reshape(
            (self._n_cam, -1, 2))[:, :self._ntask]
        goal_pix_full = np.tile(self._goal_pix_sel[:, :, None, :],
                                [1, 1, self._num_reg, 1]).reshape(
            self._n_cam, self._n_desig, 2)
        desig_full = np.tile(
            np.array(desig_pix).reshape(
                (self._n_cam, -1, 2))[:, :self._ntask, None],
            [1, 1, self._num_reg, 1]).reshape(self._n_cam, self._n_desig, 2)

        if t is not None and (self._desig_pix_t0 is None or t <= 1):
            self._desig_pix_t0 = np.array(desig_pix).reshape(
                (self._n_cam, -1, 2))[:, :self._ntask]
            self._start_image = images[0].astype(np.float32) / 255.0
        if goal_image is not None:
            gi = np.asarray(goal_image, np.float32)
            self._goal_image = gi[-1] if gi.ndim == 5 else gi

        return super().act(t, i_tr, desig_full, goal_pix_full, images, state,
                           verbose_worker)
