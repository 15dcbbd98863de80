"""Tests for the raw-detector postprocessing pipeline
(``emfusion_tpu/detector_post.py`` — reference semantics
``/root/reference/apps/maskrcnn.in.py:118-255``)."""

import numpy as np
import pytest

from emfusion_tpu import detector_post as dp
from emfusion_tpu.segmentation import NUM_CLASSES, CLASS_NAMES


def _mk_mask(H, W, y1, x1, y2, x2):
    m = np.zeros((H, W), np.float32)
    m[int(y1):int(y2), int(x1):int(x2)] = 1.0
    return m


def test_apply_box_deltas_identity_and_shift():
    boxes = np.array([[0.1, 0.1, 0.5, 0.5]])
    out = dp.apply_box_deltas(boxes, np.zeros((1, 4)))
    np.testing.assert_allclose(out, boxes, atol=1e-12)
    # dy = +0.5 heights moves the center by half a height
    out = dp.apply_box_deltas(boxes, np.array([[0.5, 0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(out, [[0.3, 0.1, 0.7, 0.5]], atol=1e-12)
    # log-scale growth
    out = dp.apply_box_deltas(boxes, np.array([[0.0, 0.0, np.log(2), 0.0]]))
    np.testing.assert_allclose(out, [[-0.1, 0.1, 0.7, 0.5]], atol=1e-12)


def test_nms_greedy_semantics():
    # three boxes: two heavily overlapping, one separate
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                     np.float64)
    scores = np.array([0.9, 0.8, 0.7])
    keep = dp.non_max_suppression(boxes, scores, 0.3)
    assert sorted(keep.tolist()) == [0, 2]
    # high threshold keeps all
    keep = dp.non_max_suppression(boxes, scores, 0.95)
    assert sorted(keep.tolist()) == [0, 1, 2]


def test_filter_rois_background_and_confidence():
    rois = np.array([[0.0, 0.0, 0.5, 0.5],
                     [0.5, 0.5, 0.9, 0.9],
                     [0.1, 0.1, 0.2, 0.2]])
    class_ids = np.array([0, 3, 5])      # first is background
    scores = np.array([0.99, 0.95, 0.5])  # last below confidence
    keep = dp.filter_rois(rois, class_ids, scores)
    assert keep.tolist() == [1]


def test_match_scores_to_detections_reorders():
    roi_boxes = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [2, 2, 8, 8]],
                         np.int32)
    scores = np.eye(3)
    det_boxes = roi_boxes[[2, 0, 1]]
    out = dp.match_scores_to_detections(det_boxes, roi_boxes, scores)
    np.testing.assert_array_equal(out, scores[[2, 0, 1]])
    with pytest.raises(ValueError):
        dp.match_scores_to_detections(
            np.array([[9, 9, 9, 9]], np.int32), roi_boxes, scores)


def test_postprocess_raw_end_to_end():
    """Synthetic proposals -> full pipeline; checks keep/score/NMS/size
    semantics jointly."""
    H, W = 240, 320
    rng = np.random.RandomState(0)
    n = 6
    C = NUM_CLASSES

    # proposals in normalized coords; boxes 0/1 overlap (same class),
    # box 2 is a confident 'chair', box 3 low confidence, box 4
    # background, box 5 small mask.
    props = np.array([
        [0.10, 0.10, 0.60, 0.60],
        [0.12, 0.12, 0.62, 0.62],
        [0.55, 0.55, 0.95, 0.95],
        [0.05, 0.65, 0.30, 0.95],
        [0.40, 0.05, 0.60, 0.30],
        [0.70, 0.05, 0.78, 0.12],
    ])
    probs = np.full((n, C), 0.001)
    cid_car = CLASS_NAMES.index("car")
    cid_chair = CLASS_NAMES.index("chair")
    probs[0, cid_car] = 0.95
    probs[1, cid_car] = 0.90
    probs[2, cid_chair] = 0.85
    probs[3, cid_chair] = 0.40      # below DETECTION_MIN_CONFIDENCE
    probs[3, 0] = 0.35              # keeps row-3 chair < 0.7 after renorm
    probs[4, 0] = 0.99              # background
    probs[5, cid_car] = 0.92        # tiny mask, killed by size filter
    probs /= probs.sum(axis=1, keepdims=True)
    # renormalization keeps argmax scores > 0.7 except row 3 (0.48)
    deltas = rng.randn(n, C, 4).astype(np.float64) * 0.01

    masks = np.stack([
        _mk_mask(H, W, 20, 30, 150, 200),
        _mk_mask(H, W, 25, 35, 155, 205),
        _mk_mask(H, W, 130, 180, 230, 310),
        _mk_mask(H, W, 10, 210, 70, 300),
        _mk_mask(H, W, 95, 15, 145, 95),
        _mk_mask(H, W, 170, 15, 180, 25),   # 10x10 px -> dropped
    ])

    dets = dp.postprocess_raw(props, probs, deltas, masks, (H, W))
    # kept: one of {0,1} (NMS), and 2; 3 low conf, 4 bg, 5 small
    ids = sorted(int(np.argmax(d.scores)) for d in dets)
    assert ids == sorted([cid_car, cid_chair])
    for d in dets:
        assert d.scores.shape == (C,)
        assert abs(d.scores.sum() - 1.0) < 1e-6
        assert d.mask.dtype == bool and d.mask.shape == (H, W)
        assert d.box is not None and d.box.shape == (4,)

    # FILTER_CLASSES restricts to chair only
    dets = dp.postprocess_raw(props, probs, deltas, masks, (H, W),
                              filter_classes=["chair"])
    assert [int(np.argmax(d.scores)) for d in dets] == [cid_chair]

    # STATIC_OBJECTS removes chair
    dets = dp.postprocess_raw(props, probs, deltas, masks, (H, W),
                              static_objects=["chair"])
    assert [int(np.argmax(d.scores)) for d in dets] == [cid_car]


def test_scores_from_labels_coco91_remap():
    # torchvision label 27 = 'backpack' (81-list index 25); label 12 is
    # an unused COCO slot -> background
    labels = np.array([27, 12])
    scores = np.array([0.9, 0.8])
    rows = dp.scores_from_labels(labels, scores)
    assert rows.shape == (2, NUM_CLASSES)
    assert np.argmax(rows[0]) == CLASS_NAMES.index("backpack")
    np.testing.assert_allclose(rows[0].sum(), 1.0)
    assert np.argmax(rows[1]) == 0


def test_scores_from_logits_prob_passthrough_and_softmax():
    # 81-wide probability rows pass through unchanged
    rows = np.zeros((1, NUM_CLASSES))
    rows[0, 5] = 1.0
    out = dp.scores_from_logits(rows)
    np.testing.assert_allclose(out, rows)
    # logits get softmaxed
    logits = np.zeros((1, NUM_CLASSES))
    logits[0, 7] = 10.0
    out = dp.scores_from_logits(logits)
    assert np.argmax(out[0]) == 7
    np.testing.assert_allclose(out.sum(), 1.0)
    # 91-wide rows are remapped: torchvision slot 27 -> backpack
    rows91 = np.zeros((1, 91))
    rows91[0, 27] = 1.0
    out = dp.scores_from_logits(rows91)
    assert np.argmax(out[0]) == CLASS_NAMES.index("backpack")


def test_torchscript_provider_parses_torchvision_dict():
    """Provider parse path on a synthetic torchvision-style output dict
    (no TorchScript model needed — _parse is exercised directly)."""
    from emfusion_tpu.segmentation import TorchScriptMaskProvider

    prov = TorchScriptMaskProvider.__new__(TorchScriptMaskProvider)
    prov.score_thresh = 0.7
    prov.mask_thresh = 0.5
    H, W = 240, 320
    out = {
        "boxes": np.array([[30.0, 20.0, 200.0, 150.0],
                           [15.0, 170.0, 25.0, 180.0]]),
        "labels": np.array([3, 3]),            # torchvision 'car'
        "scores": np.array([0.95, 0.9]),
        "masks": np.stack([_mk_mask(H, W, 20, 30, 150, 200)[None],
                           _mk_mask(H, W, 170, 15, 180, 25)[None]]),
    }
    dets = prov._parse(out)
    assert len(dets) == 1                       # second killed by size
    assert int(np.argmax(dets[0].scores)) == CLASS_NAMES.index("car")
