"""Model-free vision operators (NMS, box ordering, rec batching, crop)."""

import numpy as np

from ragflow_core16_spark.pdf.vision_ops import (nms, rec_batch_plan,
                                                 rotate_crop, sorted_boxes)


class TestNMS:
    def test_suppresses_overlapping_lower_score(self):
        boxes = np.array([[0, 0, 100, 100], [5, 5, 105, 105],
                          [200, 200, 300, 300]], dtype=float)
        scores = np.array([0.9, 0.8, 0.7])
        keep = nms(boxes, scores, iou_thresh=0.5)
        assert keep == [0, 2]

    def test_keeps_all_when_disjoint(self):
        boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30],
                          [40, 40, 50, 50]], dtype=float)
        keep = nms(boxes, np.array([0.1, 0.9, 0.5]), 0.3)
        assert sorted(keep) == [0, 1, 2]
        assert keep[0] == 1  # score-descending greedy order


class TestSortedBoxes:
    def test_reading_order_with_row_tolerance(self):
        def quad(x, y):
            return np.array([[x, y], [x + 50, y], [x + 50, y + 12],
                             [x, y + 12]], dtype=float)
        # same visual row (Δy < 10) but scanned right-first
        out = sorted_boxes(np.array([quad(300, 102), quad(20, 100),
                                     quad(20, 200)]))
        xs = [b[0][0] for b in out]
        assert xs == [20.0, 300.0, 20.0]


class TestRecBatchPlan:
    def test_ratio_sorted_batches_and_writeback_indices(self):
        shapes = [(48, 480), (48, 96), (48, 960), (48, 48)]
        plan = rec_batch_plan(shapes, batch_num=2)
        assert len(plan) == 2
        flat = [i for idxs, _ in plan for i in idxs]
        assert sorted(flat) == [0, 1, 2, 3]
        # first batch holds the narrowest crops
        assert set(plan[0][0]) == {3, 1}
        # per-batch max ratio ≥ the model's base ratio 320/48
        for _, r in plan:
            assert r >= 320 / 48 - 1e-9

    def test_max_ratio_tracks_widest_in_batch(self):
        shapes = [(48, 9600)]
        [(idxs, r)] = rec_batch_plan(shapes, batch_num=16)
        assert idxs == [0] and abs(r - 200.0) < 1e-9


class TestRotateCrop:
    def test_axis_aligned_crop_identity(self):
        img = np.arange(100 * 100).reshape(100, 100)
        pts = np.array([[10, 20], [60, 20], [60, 40], [10, 40]], dtype=float)
        out = rotate_crop(img, pts)
        assert out.shape == (20, 50)
        assert out[0, 0] == img[20, 10]

    def test_tall_crop_rotated(self):
        img = np.zeros((200, 200))
        pts = np.array([[10, 10], [30, 10], [30, 110], [10, 110]],
                       dtype=float)
        out = rotate_crop(img, pts)
        # 100 tall / 20 wide ≥ 1.5 → rotated to 20 x 100
        assert out.shape == (20, 100)

    def test_empty_detections_no_crash(self):
        assert nms([], [], 0.5) == []
        assert nms(np.zeros((0, 4)), np.array([]), 0.5) == []


class TestOnnxSlot:
    """The executor-side ONNX wiring contract (round-3 verdict item 7):
    lazy once-per-process session creation, pickling never carries the
    session, NCHW float32 feed keyed by the model's input name.  The fake
    session implements onnxruntime.InferenceSession's run/get_inputs
    surface; the last test runs the real thing whenever onnxruntime is
    importable (absent in this sandbox — skip is the documented state)."""

    class _FakeInput:
        name = "images"

    class _FakeSession:
        def __init__(self):
            self.calls = []

        def get_inputs(self):
            return [TestOnnxSlot._FakeInput()]

        def run(self, _out, feeds):
            import numpy as np
            batch = feeds["images"]
            assert batch.dtype == np.float32
            self.calls.append(batch.shape)
            return [batch.sum(axis=(1, 2, 3))]

    def _slot(self):
        from ragflow_core16_spark.pdf.vision_ops import OnnxSlot
        made = []

        def factory(path):
            made.append(path)
            return self._FakeSession()

        return OnnxSlot(model_path="/models/det.onnx",
                        session_factory=factory), made

    def test_lazy_single_session_per_process(self):
        import numpy as np
        slot, made = self._slot()
        assert made == []                      # nothing until first batch
        out1 = slot.run(np.ones((2, 3, 32, 32)))
        out2 = slot.run(np.ones((4, 3, 32, 32)))
        assert made == ["/models/det.onnx"]    # one session, reused
        assert out1[0].shape == (2,) and out2[0].shape == (4,)

    def test_pickle_drops_session(self):
        # as shipped in a UDF closure: default (module-level) factory,
        # path only — the live session must never cross the boundary
        import pickle
        from ragflow_core16_spark.pdf.vision_ops import OnnxSlot
        slot = OnnxSlot(model_path="/models/det.onnx")
        slot._session = object()               # pretend driver-side init
        clone = pickle.loads(pickle.dumps(slot))
        assert clone._session is None          # rebuilt on the executor
        assert clone.model_path == "/models/det.onnx"

    def test_unconfigured_slot_raises_not_implemented(self):
        import pytest
        from ragflow_core16_spark.pdf.vision_ops import OnnxSlot
        slot = OnnxSlot(env_var="RAG_OCR_DET_MODEL")
        with pytest.raises(NotImplementedError):
            slot.run(__import__("numpy").ones((1, 3, 8, 8)))

    def test_real_onnxruntime_when_available(self):
        import pytest
        ort = pytest.importorskip(
            "onnxruntime",
            reason="onnxruntime not installed in this sandbox — the slot "
                   "contract is exercised by the fake-session tests; see "
                   "docs/PLANS.md 'ONNX model slots' for deployment wiring")
        import numpy as np
        # minimal real model: y = identity(x), built via onnx if present
        onnx = pytest.importorskip("onnx")
        from onnx import TensorProto, helper
        node = helper.make_node("Identity", ["images"], ["out"])
        graph = helper.make_graph(
            [node], "id",
            [helper.make_tensor_value_info("images", TensorProto.FLOAT,
                                           [None, 3, 8, 8])],
            [helper.make_tensor_value_info("out", TensorProto.FLOAT,
                                           [None, 3, 8, 8])])
        model = helper.make_model(graph)
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".onnx") as f:
            onnx.save(model, f.name)
            from ragflow_core16_spark.pdf.vision_ops import OnnxSlot
            slot = OnnxSlot(model_path=f.name)
            x = np.random.rand(2, 3, 8, 8).astype(np.float32)
            out = slot.run(x)
            assert np.allclose(out[0], x)
