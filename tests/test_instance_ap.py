"""ScanNet-benchmark AP evaluator: known-answer tests."""

import numpy as np

from seggroup_tpu.eval.instance_ap import (
    OVERLAPS,
    assign_instances_for_scan,
    compute_averages,
    evaluate_matches,
    non_max_suppression,
)


def make_scene(n=1000):
    gt = np.zeros(n, np.int64)
    gt[:300] = 5 * 1000 + 1   # chair instance (class 5)
    gt[300:500] = 5 * 1000 + 2  # second chair
    gt[500:800] = 4 * 1000 + 1  # bed (class 4)
    gt[800:] = 1 * 1000         # wall -> void for instances
    return gt


def test_perfect_predictions_give_ap1():
    gt = make_scene()
    masks = np.stack([gt == 5001, gt == 5002, gt == 4001])
    labels = np.array([5, 5, 4])
    confs = np.array([0.9, 0.8, 0.95])
    m = assign_instances_for_scan(masks, labels, confs, gt)
    aps = evaluate_matches([m])
    avg = compute_averages(aps)
    assert avg["all_ap_50%"] == 1.0
    assert avg["all_ap"] == 1.0


def test_half_overlap_fails_high_thresholds():
    gt = make_scene()
    # predict only half of each chair: IoU = 0.5 -> passes 0.25/0.5? (>0.5 is
    # strict, so fails at 0.5, passes 0.25)
    m1 = np.zeros(1000, bool); m1[:150] = True
    m2 = np.zeros(1000, bool); m2[300:400] = True
    m3 = gt == 4001
    masks = np.stack([m1, m2, m3])
    labels = np.array([5, 5, 4])
    confs = np.array([0.9, 0.8, 0.95])
    m = assign_instances_for_scan(masks, labels, confs, gt)
    aps = evaluate_matches([m])
    avg = compute_averages(aps)
    assert avg["all_ap_25%"] == 1.0
    # at 0.5 the chairs fail (IoU exactly 0.5 is not > 0.5), bed passes
    chair_idx = 2  # 'chair' in CLASS_LABELS
    o50 = np.where(np.isclose(OVERLAPS, 0.5))[0][0]
    assert aps[chair_idx, o50] == 0.0


def test_void_overlap_is_not_fp():
    gt = make_scene()
    # a prediction entirely inside the void (wall) region: ignored, not FP
    mv = np.zeros(1000, bool); mv[800:] = True
    masks = np.stack([gt == 5001, gt == 5002, gt == 4001, mv])
    labels = np.array([5, 5, 4, 5])
    confs = np.array([0.9, 0.8, 0.95, 0.99])
    m = assign_instances_for_scan(masks, labels, confs, gt)
    avg = compute_averages(evaluate_matches([m]))
    assert avg["all_ap_50%"] == 1.0


def test_false_positive_lowers_ap():
    gt = make_scene()
    fp = np.zeros(1000, bool); fp[500:700] = True  # chair pred on bed region
    masks = np.stack([gt == 5001, gt == 5002, fp])
    labels = np.array([5, 5, 5])
    confs = np.array([0.9, 0.8, 0.99])  # FP has the HIGHEST confidence
    m = assign_instances_for_scan(masks, labels, confs, gt)
    aps = evaluate_matches([m])
    chair_idx = 2
    o50 = np.where(np.isclose(OVERLAPS, 0.5))[0][0]
    assert 0.0 < aps[chair_idx, o50] < 1.0


def test_nms():
    ious = np.array([[1.0, 0.9, 0.0], [0.9, 1.0, 0.0], [0.0, 0.0, 1.0]])
    scores = np.array([0.5, 0.9, 0.7])
    keep = non_max_suppression(ious, scores, threshold=0.3)
    assert set(keep.tolist()) == {1, 2}
