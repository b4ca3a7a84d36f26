"""Compat package, pallas kernel correctness (interpret mode), offline env,
and the GDN warp identity check."""

import jax
import jax.numpy as jnp
import numpy as np


def test_visual_mpc_compat_package():
    from visual_mpc.agent.general_agent import GeneralAgent as CompatAgent
    from visual_foresight_tpu.agent.general_agent import GeneralAgent
    assert CompatAgent is GeneralAgent

    from visual_mpc.policy.cem_controllers import PixelCostController as C1
    from visual_foresight_tpu.policy.cem_controllers import (
        PixelCostController as C2)
    assert C1 is C2

    from visual_mpc.video_prediction.pred_util import rollout_predictions
    assert callable(rollout_predictions)


def test_pallas_fused_warp_matches_xla():
    from visual_foresight_tpu.ops.cdna_warp import (dna_warp,
                                                    effective_pixel_kernels,
                                                    normalize_kernels)
    from visual_foresight_tpu.ops.pallas_cdna import fused_warp_composite

    rng = np.random.RandomState(0)
    B, H, W, C, P, K, M = 4, 16, 24, 3, 1, 5, 4
    prev = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    first = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    pd = jnp.asarray(rng.rand(B, H, W, P).astype(np.float32))
    fd = jnp.asarray(rng.rand(B, H, W, P).astype(np.float32))
    kern = normalize_kernels(jnp.asarray(rng.rand(B, K, K, M).astype(np.float32)))
    masks = jax.nn.softmax(
        jnp.asarray(rng.randn(B, H, W, M + 2).astype(np.float32)), -1)

    eff = effective_pixel_kernels(kern, masks, 2)
    ref_img = prev * masks[..., 0:1] + first * masks[..., 1:2] + \
        dna_warp(prev, eff)
    ref_pd = pd * masks[..., 0:1] + fd * masks[..., 1:2] + dna_warp(pd, eff)

    out_img, out_pd = fused_warp_composite(prev, first, pd, fd, kern, masks,
                                           sna=True, block_b=2, interpret=True)
    assert float(jnp.abs(out_img - ref_img).max()) < 1e-4
    assert float(jnp.abs(out_pd - ref_pd).max()) < 1e-4

    # layout-correct channel-major variant: same contract, same numbers
    from visual_foresight_tpu.ops.cdna_warp import effective_pixel_kernels
    from visual_foresight_tpu.ops.pallas_cdna import fused_warp_composite_chw
    eff_full = effective_pixel_kernels(kern, masks, 2)
    chw_img, chw_pd = fused_warp_composite_chw(
        prev, first, pd, fd, eff_full, masks[..., :2],
        sna=True, block_b=2, interpret=True)
    assert float(jnp.abs(chw_img - ref_img).max()) < 1e-4
    assert float(jnp.abs(chw_pd - ref_pd).max()) < 1e-4


def test_gdn_zero_flow_is_identity():
    """With the flow head zeroed, the warped image equals the current image."""
    from visual_foresight_tpu.models.gdn import GoalDistanceNet
    model = GoalDistanceNet(features=(8, 16, 32))
    key = jax.random.PRNGKey(0)
    cur = jax.random.uniform(key, (2, 16, 24, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 24, 3))
    params = model.init(key, cur, ref)
    params = jax.tree_util.tree_map_with_path(
        lambda path, x: jnp.zeros_like(x)
        if any(getattr(k, 'key', '') == 'flow_head' for k in path) else x,
        params)
    warped, flow, warp_pts = model.apply(params, cur, ref)
    assert float(jnp.abs(flow).max()) == 0.0
    assert float(jnp.abs(warped - cur).max()) < 1e-5


def test_gdn_shift_recovers_translation():
    """Bilinear sampling at shifted warp points reproduces a shifted image."""
    from visual_foresight_tpu.models.gdn import bilinear_sample
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 8, 10, 3).astype(np.float32))
    rr, cc = jnp.meshgrid(jnp.arange(8.0), jnp.arange(10.0), indexing='ij')
    coords = jnp.stack([rr + 2, cc], -1)[None]   # sample 2 rows down
    out = np.asarray(bilinear_sample(img, coords))
    assert np.allclose(out[0, :6], np.asarray(img)[0, 2:], atol=1e-6)
    assert np.allclose(out[0, 6:], 0.0)  # zero padding outside


def test_offline_env_replays(tmp_path):
    import cv2
    import pickle as pkl
    import os
    traj = tmp_path / 'traj_group0' / 'traj0'
    os.makedirs(traj / 'images0')
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (3, 8, 10, 3), dtype=np.uint8)
    for t in range(3):
        cv2.imwrite(str(traj / 'images0' / 'im_{}.png'.format(t)),
                    frames[t][:, :, ::-1])
    with open(traj / 'obs_dict.pkl', 'wb') as f:
        pkl.dump({'state': rng.randn(3, 3)}, f)

    from visual_foresight_tpu.envs.offline_env import OfflineEnv
    env = OfflineEnv({'data_dir': str(tmp_path)})
    obs, _ = env.reset()
    assert obs['images'].shape == (1, 8, 10, 3)
    assert np.array_equal(obs['images'][0], frames[0])
    obs1 = env.step(np.zeros(3))
    assert np.array_equal(obs1['images'][0], frames[1])


def test_predictor_list_model_path_adopts_first_member_config(tmp_path):
    """Ensemble serving: a LIST of member checkpoint dirs must adopt the
    architecture recorded in the FIRST member's model_config.json (the
    round-4 ensemble campaign served default-arch apply() against
    flagship-arch member params and crashed at trace time)."""
    import json

    cfg = {'num_masks': 4, 'enc_features': [8, 16, 16], 'kernel_size': 3}
    member = tmp_path / 'ens1'
    member.mkdir()
    (member / 'model_config.json').write_text(json.dumps(cfg))

    from visual_foresight_tpu.prediction.predictor import TPUPredictor
    p = TPUPredictor([str(member), str(tmp_path / 'ens2')],
                     {'img_dims': (16, 16), 'sequence_length': 5})
    p.restore()   # no checkpoint -> random init (warns), but config applies
    assert p.model.num_masks == 4
    assert tuple(p.model.enc_features) == (8, 16, 16)
    assert p.model.kernel_size == 3
