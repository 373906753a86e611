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
