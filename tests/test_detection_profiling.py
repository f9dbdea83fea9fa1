"""Detection table, stage timer, viz smoke tests."""

import numpy as np

from protosam_tpu.utils.detection import calc_iou, eval_detection, get_bounding_box
from protosam_tpu.utils.profiling import StageTimer
from protosam_tpu.utils.viz import plot_pred_gt, plot_prompts


def test_bbox_and_iou():
    m = np.zeros((32, 32), np.uint8)
    m[4:10, 6:20] = 1
    assert get_bounding_box(m) == (6, 4, 14, 6)
    assert calc_iou((0, 0, 10, 10), (0, 0, 10, 10)) == 1.0
    assert calc_iou((0, 0, 10, 10), (20, 20, 5, 5)) == 0.0


def test_eval_detection_table():
    preds = [{"pred_bbox": (0, 0, 10, 10), "gt_bbox": (0, 0, 10, 10),
              "score": 0.9},
             {"pred_bbox": (0, 0, 10, 10), "gt_bbox": (3, 3, 10, 10),
              "score": 0.8}]
    df = eval_detection(preds)
    assert len(df) == 10
    assert df.iloc[0]["tp"] == 1  # IoU .5: only the exact match passes
    assert 0 <= df.iloc[0]["f1"] <= 1


def test_stage_timer():
    t = StageTimer(sync=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a:" in t.report()


def test_viz_smoke(tmp_path):
    img = np.random.default_rng(0).random((32, 32))
    pred = (img > 0.5).astype(float)
    plot_pred_gt(img, pred, pred, path=str(tmp_path / "p.png"))
    plot_prompts(img, pred, points=[[5, 5]], point_labels=[1],
                 boxes=[[2, 2, 20, 20]], path=str(tmp_path / "q.png"))
    assert (tmp_path / "p.png").exists() and (tmp_path / "q.png").exists()
