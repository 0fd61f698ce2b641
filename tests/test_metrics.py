"""Golden tests for the zero-shot variation-ranking metrics.

The reference's ``compute_metrics`` (train.py:38-160) ranks, per sample and
per variation class, the original metadata (class 0) against that class's
hard negatives on the matching beatmap's logits — SURVEY.md §7 lists its
semantics as a port hazard, so expectations here are computed by hand.
"""
import numpy as np

from cm3p_tpu.train.metrics import MetricAccumulator


def test_zero_shot_per_class_ranking_golden():
    # 2 samples, 6 variations: classes [0, 1, 1, 2, 4, -1]
    classes = np.array([
        [0, 1, 1, 2, 4, -1],
        [0, 1, 1, 2, 4, -1],
    ])
    # logits_per_beatmap: (B, B, V); only the diagonal [i, i] is consulted
    logits = np.zeros((2, 2, 6), np.float32)
    # sample 0: original beats class-1 variations (2.0 > 1.0, 0.5) but
    # loses to the class-2 variation (2.0 < 3.0); class 4 ties broken by
    # argmax order (original first at equal values -> correct)
    logits[0, 0] = [2.0, 1.0, 0.5, 3.0, 2.0, -9.0]
    # sample 1: original loses to a class-1 variation, beats class 2 and 4
    logits[1, 1] = [1.0, 5.0, 0.0, 0.5, -1.0, -9.0]
    # off-diagonal rows are garbage and must be ignored
    logits[0, 1] = logits[1, 0] = 99.0

    acc = MetricAccumulator()
    acc.update_zero_shot(logits, classes)
    out = acc.result()

    assert out["accuracy_year"] == 0.5       # class 1: sample0 right, sample1 wrong
    assert out["accuracy_status"] == 0.5     # class 2: sample0 wrong, sample1 right
    assert out["accuracy_mapper"] == 1.0     # class 4: both right (tie -> original)
    # class 3 absent from every sample: no bucket total
    assert out["accuracy_tags"] is None
    # padding class -1 must never create a bucket
    assert "accuracy_padding" not in out


def test_zero_shot_top5_for_tags_and_mapper():
    # one sample, class 3 (tags) with 6 negatives; original ranks 3rd ->
    # top-1 wrong, top-5 right
    classes = np.array([[0, 3, 3, 3, 3, 3, 3]])
    logits = np.zeros((1, 1, 7), np.float32)
    logits[0, 0] = [4.0, 5.0, 4.5, 3.0, 2.0, 1.0, 0.0]
    acc = MetricAccumulator()
    acc.update_zero_shot(logits, classes)
    out = acc.result()
    assert out["accuracy_tags"] == 0.0
    assert out["top5_accuracy_tags"] == 1.0


def test_zero_shot_skips_singleton_groups():
    # class present but with no variations beyond the original -> skipped
    classes = np.array([[0, 2, -1]])
    logits = np.zeros((1, 1, 3), np.float32)
    logits[0, 0] = [1.0, 0.0, -9.0]
    acc = MetricAccumulator()
    acc.update_zero_shot(logits, classes)
    out = acc.result()
    assert out["accuracy_status"] == 1.0   # group {0, 2} has 2 members: counted
    assert out["accuracy_year"] is None    # class 1 absent entirely


def test_masked_lm_and_classification_golden():
    acc = MetricAccumulator()
    # masked LM: 2 eligible rows (label != -100); first correct, second is
    # top-5 only (true id ranks 2nd)
    logits = np.zeros((3, 8), np.float32)
    logits[0, 5] = 9.0
    logits[1, 2] = 1.0
    logits[1, 3] = 2.0
    labels = np.array([5, 2, -100])
    acc.update_masked_lm(logits, labels)
    out = acc.result()
    assert out["accuracy_masked_lm"] == 0.5
    assert out["top5_accuracy_masked_lm"] == 1.0

    # classification: 2-of-3 top-1 correct
    acc2 = MetricAccumulator()
    cl = np.zeros((3, 4), np.float32)
    cl[0, 1] = 1.0
    cl[1, 2] = 1.0
    cl[2, 0] = 1.0
    acc2.update_classification(cl, np.array([1, 2, 3]))
    out2 = acc2.result()
    assert out2["accuracy_classification"] == 2 / 3


def test_result_resets_state():
    acc = MetricAccumulator()
    classes = np.array([[0, 1]])
    logits = np.zeros((1, 1, 2), np.float32)
    logits[0, 0] = [1.0, 0.0]
    acc.update_zero_shot(logits, classes)
    assert acc.result()["accuracy_year"] == 1.0
    # after result() the accumulator is empty again
    assert acc.result() == {}
