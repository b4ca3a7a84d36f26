"""Generate the vendored full-step CDNA golden fixture.

Weights and inputs are drawn once (fixed seeds); the OUTPUTS are computed by
``tests/numpy_cdna_ref.py`` — the pure-numpy second opinion that shares no
code with ``visual_foresight_tpu.models.cdna`` — and vendored into
``tests/assets/cdna_golden_full.npz``.  ``test_cdna_golden.py`` asserts the
flax model reproduces them at the 1e-3 parity gate, so the gate is anchored
to an independent implementation (and survives data wipes).

The flax model is imported here ONLY to materialize the parameter-tree
skeleton (names/shapes); every number in the fixture's outputs comes from the
numpy implementation.

Usage: python tests/gen_cdna_fixture.py
"""

import os

import numpy as np


CFG = dict(n_context=2, num_masks=4, kernel_size=3, sdim=3, adim=3,
           enc_features=(8, 12, 16), num_distribs=1)
B, T, H, W = 2, 4, 16, 16
GT_MASK = np.array([1.0, 1.0, 0.0, 0.0], np.float32)  # 2 forced, 2 AR steps


def flat_params(tree, prefix=''):
    out = {}
    for k, v in tree.items():
        key = f'{prefix}{k}' if not prefix else f'{prefix}/{k}'
        if isinstance(v, dict):
            out.update(flat_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp

    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    import numpy_cdna_ref as ref
    from visual_foresight_tpu.models.cdna import CDNAPredictor

    rng = np.random.RandomState(7)
    images = rng.rand(B, T + 1, H, W, 3).astype(np.float32)
    actions = (rng.randn(B, T, CFG['adim']) * 0.2).astype(np.float32)
    states = (rng.randn(B, T + 1, CFG['sdim']) * 0.1).astype(np.float32)
    distribs = np.zeros((B, T + 1, H, W, 1), np.float32)
    distribs[:, :, 5, 9, 0] = 0.75
    distribs[:, :, 6, 9, 0] = 0.25

    model = CDNAPredictor(dtype=jnp.float32, std_factor=0,
                          separable_lstm=False, lstm_kernel=5, sna=True,
                          latent_dim=0, **CFG)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(images),
                        jnp.asarray(actions), jnp.asarray(states),
                        jnp.asarray(distribs),
                        gt_mask=jnp.asarray(GT_MASK))
    flat = flat_params(jax.tree.map(np.asarray, params)['params']['step'])

    gen_images, gen_distribs, gen_states = ref.classic_rollout(
        unflatten(flat), images, actions, states, distribs, GT_MASK, CFG)

    out = os.path.join(os.path.dirname(__file__), 'assets',
                       'cdna_golden_full.npz')
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez_compressed(
        out, images=images, actions=actions, states=states,
        distribs=distribs, gt_mask=GT_MASK, gen_images=gen_images,
        gen_distribs=gen_distribs, gen_states=gen_states,
        **{f'param:{k}': v for k, v in flat.items()})
    print('wrote', out, 'size', os.path.getsize(out))


if __name__ == '__main__':
    main()
