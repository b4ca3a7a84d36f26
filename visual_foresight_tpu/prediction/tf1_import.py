"""TF1 checkpoint -> flax pytree import (and the reverse export).

Replaces the reference's restore path for pretrained TF1 SAVP/CDNA weights:
``variable_checkpoint_matcher`` matched each model variable to a checkpoint
tensor whose slash-separated name ENDS with the variable's name parts
(``visual_mpc/video_prediction/checkpoint_matcher.py:4-39``).  The same
suffix semantics are kept here, applied to flax pytree leaf paths against
the tensor names of a TensorBundle read WITHOUT TensorFlow
(``tf1_bundle.read_bundle``).

Numerical-parity gate: no TF1 SAVP checkpoint is obtainable in this
environment (no TensorFlow, no network egress), so the 1e-3-vs-TF1 check is
stood in for by golden fixtures — ``tests/test_tf1_import.py`` exports a
trained flax model to a TF1 bundle, re-imports it through the full
name-matching path, and asserts the predictor's output frames are
bit-identical; layer-level semantics (SAME conv padding, bilinear resize,
scheduled sampling) are pinned in ``tests/test_misc_parity.py`` and
``tests/test_cdna_model.py``.  Pointing ``import_tf1_checkpoint`` at a real
SAVP checkpoint needs only a ``rename`` table for that repo's scope names.
"""

import jax
import numpy as np

from . import tf1_bundle


def leaf_paths(params):
    """Flatten a pytree into {slash/joined/path: leaf}."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        parts = []
        for p in path:
            if hasattr(p, 'key'):
                parts.append(str(p.key))
            elif hasattr(p, 'idx'):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        flat['/'.join(parts)] = leaf
    return flat


def suffix_match(var_names, ckpt_names, rename=None, strict=True):
    """For each variable name find the checkpoint tensor whose name ends
    with the variable's slash-parts (reference semantics, including
    first-match-wins).  ``rename`` optionally maps variable names to
    checkpoint-side names before matching.  Returns {var_name: ckpt_name}.
    """
    out = {}
    split_ckpt = [(c, c.split('/')) for c in ckpt_names]
    for var in var_names:
        target = (rename or {}).get(var, var)
        parts = target.split('/')
        found = None
        for ck_name, ck_parts in split_ckpt:
            if ck_parts[-len(parts):] == parts:
                found = ck_name
                break
        if found is None:
            if strict:
                raise ValueError('did not find variable {}'.format(var))
            continue
        out[var] = found
    return out


def export_tf1_checkpoint(params, prefix, scope='model'):
    """Write a flax pytree as a TF1 TensorBundle; leaf paths become
    slash-joined names under ``scope`` (matching how TF1 variable scopes
    produced names like ``model/enc0/conv/kernel``)."""
    tensors = {}
    for path, leaf in leaf_paths(params).items():
        tensors['{}/{}'.format(scope, path)] = np.asarray(leaf)
    return tf1_bundle.write_bundle(prefix, tensors)


def import_tf1_checkpoint(prefix, template, rename=None, strict=True,
                          cast=True):
    """Load a TF1 checkpoint into the structure of ``template``.

    Each template leaf path is suffix-matched against the checkpoint's
    tensor names; shapes must agree exactly (conv kernels are HWIO in both
    TF1 and flax — no transposes needed for the CDNA family).  Returns
    (pytree, report) where report lists matches and any checkpoint tensors
    left unused.
    """
    available = tf1_bundle.list_variables(prefix)
    flat_template = leaf_paths(template)
    matches = suffix_match(sorted(flat_template), sorted(available),
                           rename=rename, strict=strict)

    needed = sorted(set(matches.values()))
    loaded = tf1_bundle.read_bundle(prefix, names=set(needed))

    new_leaves = {}
    for var, ck_name in matches.items():
        tmpl = flat_template[var]
        arr = np.asarray(loaded[ck_name])
        if tuple(arr.shape) != tuple(np.shape(tmpl)):
            raise ValueError(
                'shape mismatch for {} <- {}: ckpt {} vs model {}'.format(
                    var, ck_name, arr.shape, np.shape(tmpl)))
        if cast and hasattr(tmpl, 'dtype'):
            arr = arr.astype(tmpl.dtype)
        new_leaves[var] = arr

    leaves_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    rebuilt = []
    for path, leaf in leaves_path:
        parts = []
        for p in path:
            parts.append(str(p.key) if hasattr(p, 'key')
                         else str(getattr(p, 'idx', p)))
        key = '/'.join(parts)
        rebuilt.append(new_leaves.get(key, leaf))
    pytree = jax.tree_util.tree_unflatten(treedef, rebuilt)

    report = {
        'matched': matches,
        'missing': sorted(set(flat_template) - set(matches)),
        'unused_ckpt': sorted(set(available) - set(matches.values())),
    }
    return pytree, report
