"""ONNX inference path coverage (VERDICT r2 item 9): the optional-import
wrapper (misc/segmentation.py onnx_model, ref: src/aliceVision/
segmentation/segmentation.hpp:119-120) exercised through a MOCKED
onnxruntime session — the image has no onnxruntime, so the mock is the
contract test; a real-ORT test runs if the runtime is ever present."""

import sys
import types

import numpy as np
import pytest


class _FakeIO:
    def __init__(self, name):
        self.name = name


class _FakeSession:
    """Mimics ort.InferenceSession for a 1-input NCHW 'sky' model: the
    output is a (1, 1, h, w) blueness score — deterministic math so the
    tiled harness result can be asserted exactly."""

    def __init__(self, path, providers=None):
        self.path = path
        self.providers = providers

    def get_inputs(self):
        return [_FakeIO("input0")]

    def run(self, outputs, feeds):
        x = feeds["input0"]  # (1, C, h, w)
        assert x.ndim == 4 and x.dtype == np.float32
        if x.shape[1] >= 3:
            score = x[:, 2] - np.maximum(x[:, 0], x[:, 1])
        else:
            score = x[:, 0]
        return [np.clip(score + 0.5, 0, 1)[:, None]]  # (1, 1, h, w)


@pytest.fixture()
def mocked_ort(monkeypatch):
    fake = types.ModuleType("onnxruntime")
    fake.InferenceSession = _FakeSession
    monkeypatch.setitem(sys.modules, "onnxruntime", fake)
    return fake


def test_onnx_model_wrapper_runs_tiled(mocked_ort, tmp_path):
    from alicevision_tpu.misc.segmentation import (
        have_onnxruntime,
        onnx_model,
        segment_tiled,
    )

    assert have_onnxruntime()
    model = str(tmp_path / "sky.onnx")
    open(model, "wb").write(b"\x08mock")
    run = onnx_model(model)

    rng = np.random.RandomState(0)
    img = rng.rand(200, 260, 3).astype(np.float32)
    img[:80] = [0.2, 0.3, 0.9]  # blue top
    out = segment_tiled(img, run, tile=128, overlap=16)
    assert out.shape == (200, 260)
    # blue region scores high, the rest lower
    assert out[:70].mean() > 0.9
    assert out[:70].mean() > out[120:].mean() + 0.2
    # exactness away from tile seams: the mock is deterministic
    direct = np.clip(img[..., 2] - np.maximum(img[..., 0], img[..., 1]) + 0.5, 0, 1)
    np.testing.assert_allclose(out[:60, :60], direct[:60, :60], atol=1e-5)


def test_sphere_detection_onnx_path(mocked_ort, tmp_path):
    from alicevision_tpu.misc.sphere_detection import detect_sphere_onnx

    model = str(tmp_path / "sphere.onnx")
    open(model, "wb").write(b"\x08mock")
    img = np.zeros((160, 160, 3), np.float32)
    yy, xx = np.mgrid[0:160, 0:160]
    inside = (yy - 80) ** 2 + (xx - 90) ** 2 < 30**2
    img[inside] = [0.1, 0.2, 0.95]  # blue disc = high mock score
    det = detect_sphere_onnx(img, model, threshold=0.8)
    assert det is not None
    cx, cy, r = det
    assert abs(cx - 90) < 6 and abs(cy - 80) < 6
    assert abs(r - 30) < 8


def test_onnx_model_native_fallback_without_ort(monkeypatch, tmp_path):
    """Without onnxruntime the wrapper now falls back to the built-in
    native executor (utils/onnx_rt.py) and still runs real .onnx files;
    a missing file fails loudly."""
    monkeypatch.setitem(sys.modules, "onnxruntime", None)
    from alicevision_tpu.misc.segmentation import onnx_model
    from alicevision_tpu.utils.onnx_rt import make_model, make_node

    with pytest.raises(FileNotFoundError):
        onnx_model(str(tmp_path / "nonexistent.onnx"))

    w = np.zeros((1, 3, 1, 1), np.float32)
    w[0, 2] = 1.0  # y = blue channel
    data = make_model(
        [make_node("Conv", ["x", "w"], ["y"], kernel_shape=[1, 1])],
        [("x", (1, 3, 32, 32))], [("y", (1, 1, 32, 32))], {"w": w})
    path = str(tmp_path / "blue.onnx")
    open(path, "wb").write(data)
    run = onnx_model(path)
    img = np.random.RandomState(0).rand(32, 32, 3).astype(np.float32)
    np.testing.assert_allclose(run(img), img[..., 2:], atol=1e-6)


def test_real_onnxruntime_if_present(tmp_path):
    """With a real onnxruntime (absent in this image -> skipped), a tiny
    identity-conv model must flow through the same wrapper."""
    ort = pytest.importorskip("onnxruntime")
    onnx = pytest.importorskip("onnx")
    from onnx import TensorProto, helper

    # y = Conv(x, 1x1 identity kernel)
    w = helper.make_tensor("w", TensorProto.FLOAT, [1, 3, 1, 1],
                           [0.0, 0.0, 1.0])
    node = helper.make_node("Conv", ["x", "w"], ["y"])
    graph = helper.make_graph(
        [node], "g",
        [helper.make_tensor_value_info("x", TensorProto.FLOAT,
                                       [1, 3, None, None])],
        [helper.make_tensor_value_info("y", TensorProto.FLOAT,
                                       [1, 1, None, None])],
        [w],
    )
    model = helper.make_model(graph)
    path = str(tmp_path / "tiny.onnx")
    onnx.save(model, path)
    from alicevision_tpu.misc.segmentation import onnx_model, segment_tiled

    run = onnx_model(path)
    img = np.random.RandomState(0).rand(100, 120, 3).astype(np.float32)
    out = segment_tiled(img, run, tile=64, overlap=8)
    np.testing.assert_allclose(out, img[..., 2], atol=1e-5)
    del ort
