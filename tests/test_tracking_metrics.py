"""Detection-mAP matcher/AP math tests (tools/run_tracking_metrics.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from run_tracking_metrics import (
    average_precision,
    box_iou,
    evaluate_video_pair,
    filter_small_boxes,
    match_frame,
)


def test_box_iou():
    a = np.asarray([[0, 0, 10, 10]], float)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    iou = box_iou(a, b)[0]
    assert np.isclose(iou[0], 1.0)
    assert np.isclose(iou[1], 25 / 175)
    assert iou[2] == 0.0


def test_filter_small_boxes():
    boxes = np.asarray([[0, 0, 100, 100], [0, 0, 3, 3]], float)
    kept = filter_small_boxes(boxes, (100, 100))
    assert len(kept) == 1


def test_match_frame_greedy_one_to_one():
    gt = np.asarray([[0, 0, 10, 10]], float)
    preds = np.asarray(
        [[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8]], float
    )
    correct = match_frame(preds, gt)
    # only one GT box: the higher-confidence exact match takes it
    assert correct[0, 0] and not correct[1, 0]


def test_perfect_detections_ap_one():
    frames_gt = [np.asarray([[10, 10, 60, 60]], float) for _ in range(3)]
    frames_pred = [np.asarray([[10, 10, 60, 60, 0.99]], float) for _ in range(3)]
    res = evaluate_video_pair(frames_pred, frames_gt, (100, 100))
    assert res["num_gt"] == 3
    assert res["AP50"] > 0.9
    assert res["mAP50-95"] > 0.9


def test_no_detections_ap_zero():
    frames_gt = [np.asarray([[10, 10, 60, 60]], float)]
    frames_pred = [np.zeros((0, 5))]
    res = evaluate_video_pair(frames_pred, frames_gt, (100, 100))
    assert res["mAP50-95"] == 0.0


def test_average_precision_monotone():
    # one TP at conf .9, one FP at conf .1, one GT
    correct = np.asarray([[True], [False]])
    conf = np.asarray([0.9, 0.1])
    ap = average_precision(correct, conf, num_gt=1)
    assert 0.9 <= ap[0] <= 1.0
