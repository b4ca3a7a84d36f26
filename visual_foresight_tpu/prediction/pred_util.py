"""Context/batching helpers kept for reference API parity
(reference ``video_prediction/pred_util.py``).

``rollout_predictions`` chunked the CEM batch into fixed-size predictor calls
— on TPU the fused planner makes this obsolete for the hot path, but the
helper remains for custom predictors with hard batch limits.
"""

import numpy as np


def get_context(n_context, t, state, images, hp=None):
    """Slice the last n_context frames/states and normalize frames to [0,1]."""
    last_frames = images[t - n_context + 1:t + 1]
    last_frames = last_frames.astype(np.float32, copy=False) / 255.0
    last_frames = last_frames[None]
    last_states = state[t - n_context + 1:t + 1]
    last_states = last_states[None]
    if hp is not None and getattr(hp, 'state_append', None):
        append = np.tile(np.array([[hp.state_append]]), (1, n_context, 1))
        last_states = np.concatenate((last_states, append), -1)
    return last_frames, last_states


def rollout_predictions(predictor, b_size, actions, context_frames,
                        context_states=None, input_distribs=None, logger=None):
    """Chunk N action samples into fixed b_size padded batches and loop the
    predictor (host-side batching loop the fused TPU planner replaces)."""
    num_actions = actions.shape[0]
    nruns = max(1, -(-num_actions // b_size))

    def check_and_slice(arr, n):
        return arr[:n] if arr is not None else None

    gen_images, gen_distrib, gen_state = [], [], []
    for run in range(nruns):
        action_batch = actions[run * b_size:(run + 1) * b_size]
        if run == nruns - 1 and action_batch.shape[0] < b_size:
            T, adim = action_batch.shape[1:]
            padded = np.zeros((b_size, T, adim))
            padded[:action_batch.shape[0]] = action_batch
        else:
            padded = action_batch
        if logger:
            logger.log('vpred run {} with {} actions'.format(
                run, action_batch.shape[0]))
        _imgs, _distrib, _state = predictor(
            input_images=context_frames, input_state=context_states,
            input_actions=padded, input_one_hot_images=input_distribs)
        gen_images.append(check_and_slice(_imgs, action_batch.shape[0]))
        gen_distrib.append(check_and_slice(_distrib, action_batch.shape[0]))
        gen_state.append(check_and_slice(_state, action_batch.shape[0]))
    return gen_images, gen_distrib, gen_state
