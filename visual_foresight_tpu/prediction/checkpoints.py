"""Checkpoint save/restore for predictor params.

The reference restored TF1 checkpoints with latest-iteration globbing and
suffix-based variable matching (``setup_predictor.py:12-28``,
``checkpoint_matcher.py:4-39``).  Here params are flax pytrees saved with
orbax; ``latest_checkpoint`` reproduces the latest-iteration glob, and
``suffix_match_restore`` reproduces the name-drift-tolerant matcher for
pytrees whose leaf paths moved between versions.
"""

import os
import re

import jax
import numpy as np


def _ckpt_dir(path):
    return os.path.abspath(path)


def latest_checkpoint(model_dir):
    """Find the highest-step checkpoint subdir ``step_<N>`` under model_dir
    (analog of ``get_maxiter_weights``, ``setup_predictor.py:12-28``)."""
    model_dir = _ckpt_dir(model_dir)  # orbax/tensorstore require absolute paths
    if not os.path.isdir(model_dir):
        return None
    steps = []
    for name in os.listdir(model_dir):
        m = re.match(r'^step_(\d+)$', name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return os.path.join(model_dir, 'step_{}'.format(max(steps)))


def resolve_model_dir(candidates, view='view0'):
    """First candidate dir holding a RESTORABLE checkpoint under ``view``.

    The serving/bench fallback chain: a freshly trained run under
    ``/root/data`` wins, else the checkpoint vendored in the repo — gated on
    ``latest_checkpoint`` being non-None (or a TF1 ``*.index`` bundle being
    present) so a partial/stale dir can never shadow a good one with random
    weights.  Returns None when no candidate is restorable.
    """
    import glob as globlib
    for cand in candidates:
        view_dir = os.path.join(str(cand), view)
        try:
            if latest_checkpoint(view_dir) is not None:
                return cand
            if globlib.glob(os.path.join(view_dir, '*.index')):
                return cand
        except Exception:
            continue
    return None


def save_params(params, model_dir, step):
    import orbax.checkpoint as ocp
    path = os.path.join(_ckpt_dir(model_dir), 'step_{}'.format(step))
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, params, force=True)
    checkpointer.wait_until_finished()
    return path


def restore_params(model_dir, template=None, step=None):
    """Restore the latest (or given step) params pytree."""
    import orbax.checkpoint as ocp
    if step is not None:
        path = os.path.join(_ckpt_dir(model_dir), 'step_{}'.format(step))
    else:
        path = latest_checkpoint(model_dir)
    if path is None:
        raise FileNotFoundError('no checkpoints under {}'.format(model_dir))
    checkpointer = ocp.StandardCheckpointer()
    return checkpointer.restore(path, target=template)


def _flatten_with_names(params):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                        for k in path)
        flat[name] = leaf
    return flat


def suffix_match_restore(source_params, target_template):
    """Map leaves of ``source_params`` onto ``target_template`` by longest
    unique path-suffix match (analog of ``variable_checkpoint_matcher``,
    ``checkpoint_matcher.py:4-39``).  Shapes must agree; unmatched target
    leaves keep their template values."""
    src = _flatten_with_names(source_params)
    tgt_paths = jax.tree_util.tree_flatten_with_path(target_template)
    leaves, treedef = jax.tree_util.tree_flatten(target_template)

    out_leaves = []
    for (path, leaf) in tgt_paths[0]:
        name = '/'.join(str(getattr(k, 'key', getattr(k, 'idx', k)))
                        for k in path)
        match = None
        for src_name, src_leaf in src.items():
            if (name.endswith(src_name) or src_name.endswith(name)) and \
                    np.shape(src_leaf) == np.shape(leaf):
                match = src_leaf
                break
        out_leaves.append(match if match is not None else leaf)
    return jax.tree_util.tree_unflatten(treedef, out_leaves)
