"""Self-contained DeepSpeech path: wire-format reader, architecture mapping,
JAX forward golden vs a torch LSTM reimplementation, and the
``extract_deepspeech_features`` end-to-end (no TensorFlow anywhere).

Reference behavior being matched: ``data_util/deepspeech_features/
deepspeech_features.py`` (TF1 session over the frozen v0.1.0 graph)."""

import os
import struct
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from geneface_tpu.datagen.deepspeech import (  # noqa: E402
    DeepSpeechNet,
    deepspeech_logits,
    map_deepspeech_params,
    read_frozen_graph_consts,
)

# ---------------------------------------------------------------- encoders
# minimal protobuf writers — the test authors real GraphDef bytes so the
# reader is exercised on the true wire format, not on itself.


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field: int, payload: bytes) -> bytes:  # length-delimited
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vint(field: int, val: int) -> bytes:
    return _varint((field << 3) | 0) + _varint(val)


def _tensor_proto(arr: np.ndarray, use_content=True) -> bytes:
    dt = {np.dtype("f4"): 1, np.dtype("i4"): 3}[arr.dtype]
    shape = b"".join(
        _ld(2, _vint(1, int(s))) for s in arr.shape
    )  # TensorShapeProto.dim{size}
    msg = _vint(1, dt) + _ld(2, shape)
    if use_content:
        msg += _ld(4, arr.astype("<f4" if dt == 1 else "<i4").tobytes())
    else:  # packed float_val repeated field
        msg += _ld(5, arr.astype("<f4").tobytes())
    return msg


def _const_node(name: str, arr: np.ndarray, use_content=True) -> bytes:
    attr = _ld(1, b"value") + _ld(2, _ld(8, _tensor_proto(arr, use_content)))
    node = _ld(1, name.encode()) + _ld(2, b"Const") + _ld(5, attr)
    return _ld(1, node)  # GraphDef.node


def _graph_def(consts, use_content=True) -> bytes:
    extra = _ld(1, _ld(1, b"input_node") + _ld(2, b"Placeholder"))
    return extra + b"".join(
        _const_node(n, a, use_content) for n, a in consts
    )


def _random_ds_params(rng, n_input=494, cell=32, n_classes=29):
    r = lambda *s: rng.randn(*s).astype(np.float32) * 0.3
    return {
        "h1": r(n_input, cell), "b1": r(cell),
        "h2": r(cell, cell), "b2": r(cell),
        "h3": r(cell, cell), "b3": r(cell),
        "lstm_kernel": r(2 * cell, 4 * cell), "lstm_bias": r(4 * cell),
        "h5": r(cell, cell), "b5": r(cell),
        "h6": r(cell, n_classes), "b6": r(n_classes),
    }


ORDER = ("h1", "b1", "h2", "b2", "h3", "b3",
         "lstm_kernel", "lstm_bias", "h5", "b5", "h6", "b6")


# ------------------------------------------------------------------- tests


def test_wire_reader_roundtrip():
    rng = np.random.RandomState(0)
    a = rng.randn(3, 5).astype(np.float32)
    b = rng.randn(7).astype(np.float32)
    pb = _graph_def([("x/kernel", a), ("y", b)])
    consts = dict(read_frozen_graph_consts(pb))
    np.testing.assert_array_equal(consts["x/kernel"], a)
    np.testing.assert_array_equal(consts["y"], b)


def test_wire_reader_float_val_encoding():
    """float_val repeated encoding (some graph freezers use it for small
    tensors) parses identically to tensor_content."""
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    pb = _graph_def([("t", a)], use_content=False)
    consts = dict(read_frozen_graph_consts(pb))
    np.testing.assert_array_equal(consts["t"], a)


def test_param_mapping_by_name_and_by_order():
    rng = np.random.RandomState(1)
    p = _random_ds_params(rng)
    # mozilla names (h1/b1/... + lstm kernel/bias)
    named = [(k if not k.startswith("lstm") else
              f"lstm_fused_cell/{k.split('_')[1]}", p[k]) for k in ORDER]
    m1 = map_deepspeech_params(named)
    # opaque names -> shape/serialization-order fallback
    opaque = [(f"const_{i}", p[k]) for i, k in enumerate(ORDER)]
    m2 = map_deepspeech_params(opaque)
    for k in ORDER:
        np.testing.assert_array_equal(m1[k], p[k])
        np.testing.assert_array_equal(m2[k], p[k])


def test_forward_golden_vs_torch():
    """DeepSpeechNet (TF BasicLSTMCell math, i,j,f,o + forget_bias 1) vs
    torch.nn.LSTM (i,f,g,o split weights) on the same random params."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    cell, n_input = 32, 494
    p = _random_ds_params(rng, n_input=n_input, cell=cell)
    x = rng.randn(17, n_input).astype(np.float32)

    ours = np.asarray(
        DeepSpeechNet()({k: jnp.asarray(v) for k, v in p.items()},
                        jnp.asarray(x))
    )

    def clip20(t):
        return torch.clamp(torch.relu(t), max=20.0)

    with torch.no_grad():
        t = torch.from_numpy(x)
        h = clip20(t @ torch.from_numpy(p["h1"]) + torch.from_numpy(p["b1"]))
        h = clip20(h @ torch.from_numpy(p["h2"]) + torch.from_numpy(p["b2"]))
        h = clip20(h @ torch.from_numpy(p["h3"]) + torch.from_numpy(p["b3"]))

        lstm = torch.nn.LSTM(cell, cell, batch_first=False)
        W = torch.from_numpy(p["lstm_kernel"]).T  # [4c, in+c], TF i,j,f,o
        bias = torch.from_numpy(p["lstm_bias"]).clone()
        i_, j_, f_, o_ = W.split(cell, dim=0)
        bi, bj, bf, bo = bias.split(cell)
        reorder = lambda a, b, c, d: torch.cat([a, c, b, d], 0)  # -> i,f,g,o
        lstm.weight_ih_l0.copy_(reorder(i_, j_, f_, o_)[:, :cell])
        lstm.weight_hh_l0.copy_(reorder(i_, j_, f_, o_)[:, cell:])
        lstm.bias_ih_l0.copy_(
            reorder(bi, bj, bf + 1.0, bo)  # TF forget_bias folded in
        )
        lstm.bias_hh_l0.zero_()
        hs, _ = lstm(h[:, None, :])
        hs = hs[:, 0]

        h = clip20(hs @ torch.from_numpy(p["h5"]) + torch.from_numpy(p["b5"]))
        ref = (h @ torch.from_numpy(p["h6"]) + torch.from_numpy(p["b6"])).numpy()

    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_extract_deepspeech_features_end_to_end(tmp_path):
    """wav -> MFCC windows -> frozen-graph JAX forward -> [T, 16, 29]
    windows, through the public API with GF_DEEPSPEECH_PB set."""
    from geneface_tpu.datagen.asr_features import extract_deepspeech_features

    rng = np.random.RandomState(3)
    p = _random_ds_params(rng)
    pb_path = tmp_path / "output_graph.pb"
    pb_path.write_bytes(_graph_def([(k, p[k]) for k in ORDER]))

    wav = np.sin(np.linspace(0, 200 * np.pi, 16000)).astype(np.float32)
    wins = extract_deepspeech_features(
        wav, n_frames=25, graph_pb=str(pb_path)
    )
    assert wins.shape == (25, 16, 29)
    assert np.isfinite(wins).all()
    assert wins.std() > 0

    # logits themselves match the direct net forward on the same prep
    from geneface_tpu.datagen._ds_audio import audio_to_mfcc_windows

    feats, _ = audio_to_mfcc_windows(wav)
    direct = deepspeech_logits(pb_path.read_bytes(), feats)
    assert direct.shape[1] == 29
