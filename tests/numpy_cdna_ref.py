"""Independent pure-numpy implementation of the classic CDNA/SNA predictor
step — the second opinion that de-circularizes the 1e-3 parity gate.

This module deliberately shares NOTHING with ``visual_foresight_tpu``: no jax,
no flax, no imports from the package.  Every op is written from the published
math (Finn et al. 2016 eq. 1-2 for the transformed-convolution warp and the
conv-LSTM backbone; Ebert et al. 2017 for SNA background compositing) plus the
framework-agnostic layer definitions (XLA SAME-padding rule, fractionally
strided transposed convolution, layer norm over channels, LSTM gate order
i/g/f/o with the +1 forget bias).  ``tests/gen_cdna_fixture.py`` runs this on
fixed weights/inputs and vendors the outputs; ``test_cdna_golden.py`` then
asserts the flax model reproduces them — so the gate no longer relies on the
flax code agreeing with itself.

Reference architecture contract: the serving interface the reference builds
around these models is ``visual_mpc/video_prediction/setup_predictor.py:97-123``
(placeholders) and ``vpred_model_interface.py:52-88`` (output stacking); the
model internals follow Finn's released TF code semantics (correlation, ReLU'd
sum-1 kernels, softmax masks, scheduled sampling).
"""

import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def same_pad_amounts(in_size, stride, k):
    """XLA 'SAME' rule: output = ceil(in/stride); asymmetric low/high pad."""
    out = -(-in_size // stride)
    total = max((out - 1) * stride + k - in_size, 0)
    lo = total // 2
    return lo, total - lo


def conv2d_same(x, kernel, bias, stride=1):
    """Correlation (no kernel flip), NHWC x HWIO -> NHWC, SAME padding."""
    kh, kw, cin, cout = kernel.shape
    b, h, w, c = x.shape
    assert c == cin
    ph = same_pad_amounts(h, stride, kh)
    pw = same_pad_amounts(w, stride, kw)
    xp = np.pad(x, ((0, 0), ph, pw, (0, 0)))
    oh = -(-h // stride)
    ow = -(-w // stride)
    out = np.zeros((b, oh, ow, cout), np.float64)
    for i in range(kh):
        for j in range(kw):
            window = xp[:, i:i + (oh - 1) * stride + 1:stride,
                        j:j + (ow - 1) * stride + 1:stride, :]
            out += np.einsum('bhwc,cf->bhwf', window.astype(np.float64),
                             kernel[i, j].astype(np.float64))
    return (out + bias.astype(np.float64)).astype(np.float32)


def conv_transpose_same2(x, kernel, bias):
    """Fractionally strided conv, stride 2, 'SAME', kernel NOT flipped —
    the lax.conv_transpose(transpose_kernel=False) semantics: dilate the
    input with stride-1 zeros, pad (k-1+s-1) split per the SAME rule
    (k=3, s=2 -> lo 2 / hi 1), then a VALID correlation."""
    kh, kw, cin, cout = kernel.shape
    assert (kh, kw) == (3, 3), 'fixture uses 3x3 stride-2 deconvs'
    b, h, w, c = x.shape
    assert c == cin
    xd = np.zeros((b, 2 * h - 1, 2 * w - 1, c), x.dtype)
    xd[:, ::2, ::2] = x
    xp = np.pad(xd, ((0, 0), (2, 1), (2, 1), (0, 0)))
    oh, ow = 2 * h, 2 * w
    out = np.zeros((b, oh, ow, cout), np.float64)
    for i in range(kh):
        for j in range(kw):
            window = xp[:, i:i + oh, j:j + ow, :]
            out += np.einsum('bhwc,cf->bhwf', window.astype(np.float64),
                             kernel[i, j].astype(np.float64))
    return (out + bias.astype(np.float64)).astype(np.float32)


def layer_norm(x, scale, bias, eps=1e-6):
    """Normalization over the channel (last) axis."""
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def dense(x, kernel, bias):
    return x @ kernel + bias


def conv_lstm(c, h, x, gates_kernel, gates_bias):
    """Dense conv-LSTM: one SAME conv over concat([x, h]) split into
    (input, candidate, forget, output) gates; forget bias +1."""
    gates = conv2d_same(np.concatenate([x, h], axis=-1), gates_kernel,
                        gates_bias, stride=1)
    i, g, f, o = np.split(gates, 4, axis=-1)
    new_c = sigmoid(f + 1.0) * c + sigmoid(i) * np.tanh(g)
    new_h = sigmoid(o) * np.tanh(new_c)
    return new_c, new_h


# ---------------------------------------------------------------------------
# CDNA motion heads (paper eq. 1-2)
# ---------------------------------------------------------------------------

def normalize_cdna_kernels(raw, relu_shift=1e-12):
    """ReLU'd, eps-shifted, normalized to sum 1 over the spatial taps —
    transport, not amplification."""
    k = np.maximum(raw - relu_shift, 0.0) + relu_shift
    return k / k.sum(axis=(1, 2), keepdims=True)


def cdna_transform(images, kernels):
    """Correlation of each sample's image with that sample's M kernels:
    out[b, h, w, c, m] = sum_{i,j} I[b, h+i-pad, w+j-pad, c] * k[b, i, j, m]
    (zero padding)."""
    b, h, w, c = images.shape
    _, kh, kw, m = kernels.shape
    pad = kh // 2
    xp = np.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.zeros((b, h, w, c, m), np.float64)
    for i in range(kh):
        for j in range(kw):
            tap = kernels[:, i, j, :].astype(np.float64)        # (B, M)
            out += xp[:, i:i + h, j:j + w, :, None].astype(np.float64) * \
                tap[:, None, None, None, :]
    return out.astype(np.float32)


def composite_sna(prev, first, candidates, masks):
    """Convex blend under softmax masks: channel 0 = previous frame
    (background), channel 1 = first context frame (the SNA static
    candidate), channels 2.. = the M transformed candidates."""
    out = prev * masks[..., 0:1] + first * masks[..., 1:2]
    m = candidates.shape[-1]
    for idx in range(m):
        out = out + candidates[..., idx] * masks[..., 2 + idx:3 + idx]
    return out


# ---------------------------------------------------------------------------
# full classic step + rollout
# ---------------------------------------------------------------------------

def classic_step(params, lstm_states, prev_img, prev_distrib, prev_state,
                 first_img, first_distrib, action, cfg):
    """One full prediction step: 3-scale conv-LSTM encoder/decoder with
    action/state smear at the bottleneck, CDNA kernel + mask heads, SNA
    compositing of frame AND designated-pixel distribution, linear state
    head.  ``params`` is a nested dict of numpy arrays (flax layout)."""
    p = params

    def ln(name, x):
        return layer_norm(x, p[name]['ln']['scale'], p[name]['ln']['bias'])

    (c1, h1s), (c2, h2s), (c3, h3s), (c4, h4s), (c5, h5s) = lstm_states

    cond = np.concatenate([prev_state, action], axis=-1)

    # NOTE: the recurrent carry keeps the RAW lstm hidden state; the layer
    # norm applies only to the value flowing downstream within the step.
    enc0 = ln('ln0', conv2d_same(prev_img, p['enc0']['kernel'],
                                 p['enc0']['bias'], stride=2))
    c1, h1_raw = conv_lstm(c1, h1s, enc0, p['lstm1']['gates']['kernel'],
                           p['lstm1']['gates']['bias'])
    h1 = ln('ln1', h1_raw)

    enc1 = conv2d_same(h1, p['enc1']['kernel'], p['enc1']['bias'], stride=2)
    c2, h2_raw = conv_lstm(c2, h2s, enc1, p['lstm2']['gates']['kernel'],
                           p['lstm2']['gates']['bias'])
    h2 = ln('ln2', h2_raw)

    enc2 = conv2d_same(h2, p['enc2']['kernel'], p['enc2']['bias'], stride=2)
    smear = np.broadcast_to(cond[:, None, None, :],
                            enc2.shape[:3] + (cond.shape[-1],))
    enc3 = conv2d_same(np.concatenate([enc2, smear], axis=-1),
                       p['enc3']['kernel'], p['enc3']['bias'], stride=1)
    c3, h3_raw = conv_lstm(c3, h3s, enc3, p['lstm3']['gates']['kernel'],
                           p['lstm3']['gates']['bias'])
    h3 = ln('ln3', h3_raw)

    dec1 = conv_transpose_same2(h3, p['dec1']['kernel'], p['dec1']['bias'])
    c4, h4_raw = conv_lstm(c4, h4s, np.concatenate([dec1, enc1], axis=-1),
                           p['lstm4']['gates']['kernel'],
                           p['lstm4']['gates']['bias'])
    h4 = ln('ln4', h4_raw)

    dec2 = conv_transpose_same2(h4, p['dec2']['kernel'], p['dec2']['bias'])
    c5, h5_raw = conv_lstm(c5, h5s, np.concatenate([dec2, enc0], axis=-1),
                           p['lstm5']['gates']['kernel'],
                           p['lstm5']['gates']['bias'])
    h5 = ln('ln5', h5_raw)

    dec3 = ln('ln6', conv_transpose_same2(h5, p['dec3']['kernel'],
                                          p['dec3']['bias']))

    mask_logits = conv2d_same(dec3, p['mask_head']['kernel'],
                              p['mask_head']['bias'], stride=1)
    masks = softmax(mask_logits.astype(np.float64)).astype(np.float32)

    b = prev_img.shape[0]
    raw = dense(h3.reshape(b, -1), p['cdna_head']['kernel'],
                p['cdna_head']['bias'])
    K = cfg['kernel_size']
    kernels = normalize_cdna_kernels(raw.reshape(b, K, K, cfg['num_masks']))

    cand_img = cdna_transform(prev_img, kernels)
    gen_image = composite_sna(prev_img, first_img, cand_img, masks)

    cand_d = cdna_transform(prev_distrib, kernels)
    gd = composite_sna(prev_distrib, first_distrib, cand_d, masks)
    total = gd.astype(np.float64).sum(axis=(1, 2), keepdims=True)
    gen_distrib = (gd / np.maximum(total, 1e-12)).astype(np.float32)

    gen_state = prev_state + dense(cond, p['state_head']['kernel'],
                                   p['state_head']['bias'])

    new_states = ((c1, h1_raw), (c2, h2_raw), (c3, h3_raw), (c4, h4_raw),
                  (c5, h5_raw))
    return new_states, gen_image, gen_distrib, gen_state


def classic_rollout(params, images, actions, states, distribs, gt_mask, cfg):
    """Full-horizon rollout with per-step teacher-forcing flags (scheduled
    sampling): step t blends the network's own prediction with ground-truth
    frame t under ``gt_mask[:, t]``; the first step is always forced.
    Output index t predicts frame t+1."""
    b, n_in, h, w, _ = images.shape
    T = actions.shape[1]
    f1, f2, f3 = cfg['enc_features']

    def zeros(hh, ww, f):
        return (np.zeros((b, hh, ww, f), np.float32),
                np.zeros((b, hh, ww, f), np.float32))

    lstm_states = (zeros(h // 2, w // 2, f1), zeros(h // 4, w // 4, f2),
                   zeros(h // 8, w // 8, f3), zeros(h // 4, w // 4, f2),
                   zeros(h // 2, w // 2, f1))

    def padt(x):
        if x.shape[1] >= T:
            return x[:, :T]
        pad = np.zeros((x.shape[0], T - x.shape[1]) + x.shape[2:], x.dtype)
        return np.concatenate([x, pad], axis=1)

    gt_images, gt_states, gt_distribs = padt(images), padt(states), \
        padt(distribs)
    gt_mask = np.array(gt_mask, np.float32)
    if gt_mask.ndim == 1:
        gt_mask = np.tile(gt_mask[None], (b, 1))
    gt_mask = gt_mask.copy()
    gt_mask[:, 0] = 1.0

    first_img, first_distrib = images[:, 0], distribs[:, 0]
    prev_img, prev_distrib = first_img, first_distrib
    prev_state = states[:, 0]

    gen_images, gen_distribs, gen_states = [], [], []
    for t in range(T):
        u = gt_mask[:, t]
        ui = u[:, None, None, None]
        inp_img = ui * gt_images[:, t] + (1 - ui) * prev_img
        inp_distrib = ui * gt_distribs[:, t] + (1 - ui) * prev_distrib
        inp_state = u[:, None] * gt_states[:, t] + \
            (1 - u[:, None]) * prev_state
        lstm_states, prev_img, prev_distrib, prev_state = classic_step(
            params, lstm_states, inp_img, inp_distrib, inp_state,
            first_img, first_distrib, actions[:, t], cfg)
        gen_images.append(prev_img)
        gen_distribs.append(prev_distrib)
        gen_states.append(prev_state)

    return (np.stack(gen_images, 1), np.stack(gen_distribs, 1),
            np.stack(gen_states, 1))
