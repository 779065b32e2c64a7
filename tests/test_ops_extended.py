"""Attention / RNN / control flow / resize / misc op tests vs torch goldens.

Follows the reference's test strategy (SURVEY.md section 4): table-driven
per-op cases validated against PyTorch reference outputs.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from util import assert_close, run_op

RNG = np.random.default_rng(11)


# --- attention -------------------------------------------------------------

def test_attention_4d_causal():
    B, H, T, D = 2, 4, 9, 16
    q = RNG.standard_normal((B, H, T, D)).astype(np.float32)
    k = RNG.standard_normal((B, H, T, D)).astype(np.float32)
    v = RNG.standard_normal((B, H, T, D)).astype(np.float32)
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), is_causal=True
    ).numpy()
    got = run_op("Attention", [q, k, v], {"is_causal": 1})
    assert_close(got, want, rtol=1e-4, atol=1e-5)


def test_attention_gqa_with_past():
    B, Hq, Hkv, T, P, D = 1, 8, 2, 4, 6, 8
    q = RNG.standard_normal((B, Hq, T, D)).astype(np.float32)
    k = RNG.standard_normal((B, Hkv, T, D)).astype(np.float32)
    v = RNG.standard_normal((B, Hkv, T, D)).astype(np.float32)
    pk = RNG.standard_normal((B, Hkv, P, D)).astype(np.float32)
    pv = RNG.standard_normal((B, Hkv, P, D)).astype(np.float32)
    kk = np.concatenate([pk, k], 2)
    vv = np.concatenate([pv, v], 2)
    want = F.scaled_dot_product_attention(
        torch.from_numpy(q),
        torch.from_numpy(np.repeat(kk, Hq // Hkv, 1)),
        torch.from_numpy(np.repeat(vv, Hq // Hkv, 1)),
    ).numpy()
    out, prk, prv = run_op(
        "Attention", [q, k, v, None, pk, pv], {}, n_outputs=3
    )
    assert_close(out, want, rtol=1e-4, atol=1e-5)
    assert_close(prk, kk)
    assert_close(prv, vv)


def test_attention_3d_with_bool_mask():
    B, H, T, D = 2, 2, 5, 8
    q = RNG.standard_normal((B, T, H * D)).astype(np.float32)
    k = RNG.standard_normal((B, T, H * D)).astype(np.float32)
    v = RNG.standard_normal((B, T, H * D)).astype(np.float32)
    mask = RNG.random((T, T)) > 0.3

    def heads(x):
        return torch.from_numpy(x).view(B, T, H, D).transpose(1, 2)

    want = (
        F.scaled_dot_product_attention(
            heads(q), heads(k), heads(v), attn_mask=torch.from_numpy(mask)
        )
        .transpose(1, 2)
        .reshape(B, T, H * D)
        .numpy()
    )
    got = run_op(
        "Attention", [q, k, v, mask], {"q_num_heads": H, "kv_num_heads": H}
    )
    assert_close(got, want, rtol=1e-4, atol=1e-5)


def test_flash_attention_interpret_matches_xla():
    from rten_tpu.kernels.flash_attention import mha_pallas, mha_xla

    B, Hq, Hkv, Tq, Tk, D = 1, 4, 2, 40, 56, 32
    q = RNG.standard_normal((B, Hq, Tq, D)).astype(np.float32)
    k = RNG.standard_normal((B, Hkv, Tk, D)).astype(np.float32)
    v = RNG.standard_normal((B, Hkv, Tk, D)).astype(np.float32)
    for causal in (False, True):
        for softcap in (0.0, 30.0):
            got = mha_pallas(
                q, k, v, causal=causal, softcap=softcap,
                block_q=16, block_k=128, interpret=True,
            )
            want = mha_xla(q, k, v, causal=causal, softcap=softcap)
            assert_close(got, want, rtol=1e-4, atol=1e-5, msg=f"causal={causal}")


def test_rotary_embedding():
    B, H, S, D = 2, 4, 6, 16
    x = RNG.standard_normal((B, H, S, D)).astype(np.float32)
    inv = 1.0 / (10000 ** (np.arange(D // 2) / (D // 2)))
    pos = np.arange(32)
    angles = pos[:, None] * inv[None, :]
    cos, sin = np.cos(angles).astype(np.float32), np.sin(angles).astype(np.float32)
    got = run_op("RotaryEmbedding", [x, cos, sin], {})
    # Reference: non-interleaved halves rotation.
    x1, x2 = x[..., : D // 2], x[..., D // 2 :]
    c = cos[:S][None, None]
    s = sin[:S][None, None]
    want = np.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], -1)
    assert_close(got, want, rtol=1e-5, atol=1e-5)


# --- RNN -------------------------------------------------------------------

@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_vs_torch(bidirectional):
    I, H, T, B = 8, 12, 5, 3
    torch.manual_seed(0)
    m = torch.nn.LSTM(I, H, bidirectional=bidirectional)
    x = torch.randn(T, B, I)
    with torch.no_grad():
        want_y, (want_h, want_c) = m(x)
    dirs = 2 if bidirectional else 1
    # torch gates iofc ordering differs: torch uses ifgo; ONNX wants iofc.
    Ws, Rs, Bs = [], [], []
    for d in range(dirs):
        sfx = "_reverse" if d == 1 else ""
        w_ih = getattr(m, f"weight_ih_l0{sfx}").detach().numpy()  # [4H, I] ifgo
        w_hh = getattr(m, f"weight_hh_l0{sfx}").detach().numpy()
        b_ih = getattr(m, f"bias_ih_l0{sfx}").detach().numpy()
        b_hh = getattr(m, f"bias_hh_l0{sfx}").detach().numpy()

        def reorder(w):
            i, f, g, o = np.split(w, 4, axis=0)
            return np.concatenate([i, o, f, g], axis=0)  # -> iofc

        Ws.append(reorder(w_ih))
        Rs.append(reorder(w_hh))
        Bs.append(np.concatenate([reorder(b_ih[:, None])[:, 0], reorder(b_hh[:, None])[:, 0]]))
    W = np.stack(Ws).astype(np.float32)
    R = np.stack(Rs).astype(np.float32)
    Bias = np.stack(Bs).astype(np.float32)
    direction = "bidirectional" if bidirectional else "forward"
    y, yh, yc = run_op(
        "LSTM",
        [x.numpy(), W, R, Bias],
        {"hidden_size": H, "direction": direction},
        n_outputs=3,
    )
    # ONNX Y: [T, dirs, B, H]; torch: [T, B, dirs*H]
    y_torch = want_y.numpy().reshape(T, B, dirs, H).transpose(0, 2, 1, 3)
    assert_close(y, y_torch, rtol=1e-4, atol=1e-5)
    assert_close(yh, want_h.numpy(), rtol=1e-4, atol=1e-5)
    assert_close(yc, want_c.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("linear_before_reset", [1])
def test_gru_vs_torch(linear_before_reset):
    # torch GRU == ONNX GRU with linear_before_reset=1, gate order zrh<->rzn.
    I, H, T, B = 6, 10, 4, 2
    torch.manual_seed(1)
    m = torch.nn.GRU(I, H)
    x = torch.randn(T, B, I)
    with torch.no_grad():
        want_y, want_h = m(x)
    w_ih = m.weight_ih_l0.detach().numpy()  # [3H, I] rzn
    w_hh = m.weight_hh_l0.detach().numpy()
    b_ih = m.bias_ih_l0.detach().numpy()
    b_hh = m.bias_hh_l0.detach().numpy()

    def reorder(w):
        r, z, n = np.split(w, 3, axis=0)
        return np.concatenate([z, r, n], axis=0)  # -> zrh

    W = reorder(w_ih)[None].astype(np.float32)
    R = reorder(w_hh)[None].astype(np.float32)
    Bias = np.concatenate([reorder(b_ih[:, None])[:, 0], reorder(b_hh[:, None])[:, 0]])[
        None
    ].astype(np.float32)
    y, yh = run_op(
        "GRU",
        [x.numpy(), W, R, Bias],
        {"hidden_size": H, "linear_before_reset": linear_before_reset},
        n_outputs=2,
    )
    assert_close(y[:, 0], want_y.numpy(), rtol=1e-4, atol=1e-5)
    assert_close(yh, want_h.numpy(), rtol=1e-4, atol=1e-5)


# --- control flow ----------------------------------------------------------

def _make_branch(value):
    from rten_tpu.ir.builder import GraphBuilder

    b = GraphBuilder()
    c = b.constant("c", np.float32(value))
    out = b.op("Identity", [c])
    b.output(out)
    return b.finish()


def test_if_concrete_and_traced():
    then_g = _make_branch(1.0)
    else_g = _make_branch(2.0)
    got = run_op(
        "If", [np.asarray(True)], {"then_branch": then_g, "else_branch": else_g},
        const_mask=[True],
    )
    assert float(got) == 1.0
    got = run_op(
        "If", [np.asarray(False)], {"then_branch": then_g, "else_branch": else_g}
    )
    assert float(got) == 2.0


def test_loop_concrete_unroll():
    # body: (i, cond, x) -> (cond, x*2, x*2)  [1 dep + 1 scan output]
    from rten_tpu.ir.builder import GraphBuilder

    b = GraphBuilder()
    i = b.input("i")
    cond = b.input("cond")
    x = b.input("x")
    two = b.constant("two", np.float32(2.0))
    x2 = b.op("Mul", [x, two])
    cond_out = b.op("Identity", [cond])
    scan = b.op("Identity", [x2])
    b.output(cond_out, x2, scan)
    body = b.finish()

    final, scans = run_op(
        "Loop",
        [np.asarray(3, np.int32), np.asarray(True), np.float32(1.0)],
        {"body": body},
        n_outputs=2,
        const_mask=[True, True, False],
    )
    assert float(final) == 8.0
    assert_close(scans, np.asarray([2.0, 4.0, 8.0], np.float32))


# --- einsum / resize / grid sample ----------------------------------------

def test_einsum():
    a = RNG.standard_normal((3, 4, 5)).astype(np.float32)
    b = RNG.standard_normal((5, 6)).astype(np.float32)
    got = run_op("Einsum", [a, b], {"equation": "bij,jk->bik"})
    assert_close(got, np.einsum("bij,jk->bik", a, b), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "mode,torch_mode,coord",
    [
        ("nearest", "nearest", "asymmetric"),
        ("linear", "bilinear", "half_pixel"),
        ("linear", "bilinear", "align_corners"),
        ("cubic", "bicubic", "half_pixel"),
    ],
)
def test_resize_vs_torch(mode, torch_mode, coord):
    x = RNG.standard_normal((1, 3, 8, 8)).astype(np.float32)
    scales = np.asarray([1, 1, 2.0, 2.0], np.float32)
    align = coord == "align_corners"
    kwargs = {}
    if torch_mode != "nearest":
        kwargs["align_corners"] = align
    want = F.interpolate(torch.from_numpy(x), scale_factor=2, mode=torch_mode, **kwargs).numpy()
    attrs = {
        "mode": mode,
        "coordinate_transformation_mode": coord,
        "nearest_mode": "floor",
    }
    got = run_op("Resize", [x, None, scales], attrs, const_mask=[False, False, True])
    assert_close(got, want, rtol=1e-3, atol=1e-4)


def test_grid_sample_vs_torch():
    x = RNG.standard_normal((2, 3, 6, 6)).astype(np.float32)
    grid = (RNG.random((2, 4, 5, 2)) * 2 - 1).astype(np.float32)
    for align in (0, 1):
        want = F.grid_sample(
            torch.from_numpy(x), torch.from_numpy(grid),
            mode="bilinear", padding_mode="zeros", align_corners=bool(align),
        ).numpy()
        got = run_op(
            "GridSample", [x, grid], {"mode": "linear", "align_corners": align}
        )
        assert_close(got, want, rtol=1e-4, atol=1e-5, msg=f"align={align}")


# --- fft / sequence / random / nms ----------------------------------------

def test_stft():
    B, L = 2, 64
    sig = RNG.standard_normal((B, L)).astype(np.float32)
    step, flen = 16, 32
    win = np.hanning(flen).astype(np.float32)
    got = run_op(
        "STFT",
        [sig, np.asarray(step, np.int32), win],
        {"onesided": 1},
        const_mask=[False, True, False],
    )
    want = torch.stft(
        torch.from_numpy(sig), n_fft=flen, hop_length=step,
        window=torch.from_numpy(win), center=False, return_complex=True,
    ).numpy()  # [B, bins, frames]
    want = np.stack([want.real, want.imag], -1).transpose(0, 2, 1, 3)
    assert_close(got, want, rtol=1e-3, atol=1e-4)


def test_sequence_ops():
    a = np.float32([1, 2])
    b = np.float32([3, 4])
    seq = run_op("SequenceConstruct", [a, b], n_outputs=1)
    # run through a chained graph instead: construct -> insert -> concat
    from rten_tpu import Executor, GraphBuilder, RunConfig

    gb = GraphBuilder()
    x = gb.constant("a", a)
    y = gb.constant("b", b)
    s = gb.op("SequenceConstruct", [x, y])
    s2 = gb.op("SequenceInsert", [s, gb.constant("c", np.float32([5, 6]))])
    ln = gb.op("SequenceLength", [s2])
    cat = gb.op("ConcatFromSequence", [s2], {"axis": 0})
    gb.output(ln, cat)
    g = gb.finish()
    outs = Executor(g, RunConfig()).run({}, g.output_ids, jit=False)
    assert int(outs[0]) == 3
    assert_close(np.asarray(outs[1]), np.float32([1, 2, 3, 4, 5, 6]))


def test_random_ops():
    out = run_op("RandomNormal", [], {"shape": [200, 50], "mean": 1.0, "scale": 2.0})
    assert out.shape == (200, 50)
    assert abs(float(np.mean(out)) - 1.0) < 0.1
    out = run_op("RandomUniform", [], {"shape": [100], "low": 3.0, "high": 5.0})
    assert float(np.min(out)) >= 3.0 and float(np.max(out)) <= 5.0
    logits = np.log(np.float32([[0.9, 0.05, 0.05]]))
    samples = run_op("Multinomial", [logits], {"sample_size": 64})
    assert samples.shape == (1, 64)
    assert np.bincount(samples[0], minlength=3)[0] > 40


def test_nms():
    boxes = np.float32([[[0, 0, 1, 1], [0, 0.05, 1, 1.05], [2, 2, 3, 3]]])
    scores = np.float32([[[0.9, 0.8, 0.7]]])
    got = run_op(
        "NonMaxSuppression",
        [boxes, scores, np.int64(10), np.float32(0.5)],
        const_mask=[True, True, True, True],
    )
    assert_close(got, np.int32([[0, 0, 0], [0, 0, 2]]))


def test_contrib_gelus():
    x = RNG.standard_normal((4, 8)).astype(np.float32)
    b = RNG.standard_normal((8,)).astype(np.float32)
    want = F.gelu(torch.from_numpy(x + b)).numpy()
    assert_close(run_op("BiasGelu", [x, b]), want, rtol=1e-4, atol=1e-5)
    want = F.gelu(torch.from_numpy(x), approximate="tanh").numpy()
    assert_close(run_op("FastGelu", [x]), want, rtol=1e-4, atol=1e-5)
    got = run_op("QuickGelu", [x])
    assert_close(got, x * (1 / (1 + np.exp(-1.702 * x))), rtol=1e-4, atol=1e-5)


def test_skip_layer_norm():
    x = RNG.standard_normal((2, 3, 16)).astype(np.float32)
    skip = RNG.standard_normal((2, 3, 16)).astype(np.float32)
    gamma = RNG.standard_normal((16,)).astype(np.float32)
    beta = RNG.standard_normal((16,)).astype(np.float32)
    want = F.layer_norm(
        torch.from_numpy(x + skip), (16,), torch.from_numpy(gamma), torch.from_numpy(beta)
    ).numpy()
    got = run_op("SkipLayerNormalization", [x, skip, gamma, beta])
    assert_close(got, want, rtol=1e-4, atol=1e-5)
