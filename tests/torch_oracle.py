"""Independent PyTorch oracle for full-model cross-checks.

The reference's end-to-end golden fixtures live in testdata/untracked (not in
git), so full-pipeline fidelity is verified against this minimal functional
torch implementation of the Silero architectures instead. Used ONLY by tests,
on CPU, at fp32. Written from the architecture spec (see SURVEY.md §2.4-2.5);
weights come from the same .testtensor archives the JAX models load.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as tf

from vadc_tpu.nn.functional import ADAPTIVE_NORM_FILTER

torch.set_grad_enabled(False)


def t(x) -> torch.Tensor:
    return torch.as_tensor(np.asarray(x), dtype=torch.float32)


def stft_magnitude(audio, basis, pad_left, pad_right, hop):
    audio = tf.pad(t(audio), (pad_left, pad_right), mode="reflect")
    basis = t(basis)
    if basis.ndim == 2:
        basis = basis[:, None, :]
    spec = tf.conv1d(audio.unsqueeze(1), basis, stride=hop)
    cutoff = basis.shape[-1] // 2 + 1
    real, imag = spec[:, :cutoff], spec[:, cutoff:]
    return torch.sqrt(real**2 + imag**2)


def adaptive_norm(spect):
    e = torch.log1p(t(spect).double() * 1048576.0).float()
    mean = e.mean(dim=1, keepdim=True)
    taps = torch.tensor(ADAPTIVE_NORM_FILTER, dtype=torch.float32).view(1, 1, 7)
    smoothed = tf.conv1d(tf.pad(mean, (3, 3), mode="reflect"), taps)
    return e - smoothed.mean(dim=-1, keepdim=True)


def conv_block(x, p):
    h = tf.conv1d(
        t(x), t(p["dw_w"])[:, None, :], t(p["dw_b"]), padding=2, groups=p["dw_w"].shape[0]
    ).relu()
    h = tf.conv1d(h, t(p["pw_w"])[:, :, None], t(p["pw_b"]))
    if "proj_w" in p:
        h = h + tf.conv1d(t(x), t(p["proj_w"])[:, :, None], t(p["proj_b"]))
    else:
        h = h + t(x)
    return h.relu()


def attention(x, p):
    bsz, seq, dim = x.shape
    qkv = tf.linear(x, t(p["qkv_w"]), t(p["qkv_b"]))
    q, k, v = qkv.chunk(3, dim=-1)
    hd = dim // 2

    def heads(z):
        return z.reshape(bsz, seq, 2, hd).permute(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    alpha = torch.softmax(k @ q.transpose(-1, -2) / (hd**0.5), dim=-1)
    out = (alpha @ v).permute(0, 2, 1, 3).reshape(bsz, seq, dim)
    return tf.linear(out, t(p["att_proj_w"]), t(p["att_proj_b"]))


def transformer_block(x, p):
    h = t(x).permute(0, 2, 1)
    h = h + attention(h, p)
    h = tf.layer_norm(h, (h.shape[-1],), t(p["norm1_w"]), t(p["norm1_b"]))
    ff = tf.linear(
        tf.linear(h, t(p["lin1_w"]), t(p["lin1_b"])).relu(), t(p["lin2_w"]), t(p["lin2_b"])
    )
    h = tf.layer_norm(h + ff, (h.shape[-1],), t(p["norm2_w"]), t(p["norm2_b"]))
    return h.permute(0, 2, 1)


def transformer_layer(x, p, stride, with_transformer=True):
    h = conv_block(x, p)
    if with_transformer:
        h = transformer_block(h, p)
    h = tf.conv1d(h, t(p["conv_w"])[:, :, None], t(p["conv_b"]), stride=stride)
    h = tf.batch_norm(
        h, t(p["bn_mean"]), t(p["bn_var"]), t(p["bn_w"]), t(p["bn_b"]), False, 0.0, 1e-5
    )
    return h.relu()


def lstm_fused(x, h0, c0, w, b):
    """Sequence LSTM with fused ih|hh weights and pre-summed biases.

    x: [B, T, H]; h0, c0: [L, B, H]; w: [L, 4H, 2H]; b: [L, 4H].
    """
    x, h, c, w, b = t(x), t(h0).clone(), t(c0).clone(), t(w), t(b)
    layers = w.shape[0]
    outs = []
    for step in range(x.shape[1]):
        inp = x[:, step]
        for layer in range(layers):
            gates = tf.linear(torch.cat([inp, h[layer]], dim=-1), w[layer], b[layer])
            i, f, g, o = gates.chunk(4, dim=-1)
            c[layer] = f.sigmoid() * c[layer] + i.sigmoid() * g.tanh()
            h[layer] = o.sigmoid() * c[layer].tanh()
            inp = h[layer]
        # clone: h[layer] is a view that later in-place assignments mutate
        outs.append(inp.clone())
    return torch.stack(outs, dim=1), h, c


def silero_v4_forward(params, audio, h, c):
    """Full v4 forward (16 kHz: stage strides 2,2,2,1; BN folded into convs).
    Returns (probs, hn, cn) as numpy."""
    spect = stft_magnitude(audio, params["stft_basis"], 96, 96, 64)
    normalized = adaptive_norm(spect)
    x = torch.cat([spect, normalized], dim=1)
    for p, stride in zip(params["stages"], (2, 2, 2, 1)):
        x = conv_block(x, p)
        x = tf.conv1d(x, t(p["conv_w"])[:, :, None], t(p["conv_b"]), stride=stride)
        x = x.relu()
    feats = x.permute(0, 2, 1)
    out, hn, cn = lstm_fused(feats, h, c, params["lstm_w"], params["lstm_b"])
    dec = tf.conv1d(
        out.permute(0, 2, 1).relu(), t(params["dec_w"])[:, :, None], t(params["dec_b"])
    )
    probs = dec.sigmoid().squeeze(1).mean(dim=-1)
    return probs.numpy(), hn.numpy(), cn.numpy()


def silero_v5_forward(params, audio, h, c, pad_right=64, hop=128):
    """Full v5 forward: audio [B, 576] (64 context + 512 window), right-only
    reflect pad 64, hop 128, 4 reparam k3 convs (strides 1,2,2,1), 1-layer
    LSTM hidden 128, 1-logit decoder. The 8 kHz branch passes pad_right=32,
    hop=64 (half-rate STFT geometry). Returns (probs, hn, cn) as numpy."""
    spect = stft_magnitude(audio, params["stft_basis"], 0, pad_right, hop)
    x = spect
    for p, stride in zip(params["encoder"], (1, 2, 2, 1)):
        x = tf.conv1d(x, t(p["w"]), t(p["b"]), stride=stride, padding=1).relu()
    feats = x.permute(0, 2, 1)
    out, hn, cn = lstm_fused(feats, h, c, params["lstm_w"], params["lstm_b"])
    dec = tf.conv1d(
        out.permute(0, 2, 1).relu(), t(params["dec_w"])[:, :, None], t(params["dec_b"])
    )
    probs = dec.sigmoid().squeeze(1).mean(dim=-1)
    return probs.numpy(), hn.numpy(), cn.numpy()


def silero_v31_forward(params, audio, h, c, minibatched=False):
    """Full v3.1 forward. Returns (probs, hn, cn) as numpy."""
    spect = stft_magnitude(audio, params["stft_basis"], 128, 128, 64)
    x = adaptive_norm(spect)
    for p, stride in zip(params["layers"], (2, 2, 1, 1)):
        x = transformer_layer(x, p, stride)
    feats = x.permute(0, 2, 1)  # [B, T, 64]
    if minibatched:
        n, ts, f = feats.shape
        out, hn, cn = lstm_fused(
            feats.reshape(1, n * ts, f), h, c, params["lstm_w"], params["lstm_b"]
        )
        out = out.reshape(n, ts, f)
    else:
        out, hn, cn = lstm_fused(feats, h, c, params["lstm_w"], params["lstm_b"])
    dec = tf.conv1d(
        out.permute(0, 2, 1).relu(), t(params["dec_w"])[:, :, None], t(params["dec_b"])
    )
    probs = dec.mean(dim=-1).sigmoid()[:, 1]
    return probs.numpy(), hn.numpy(), cn.numpy()
