"""Packing collator: variable-length samples → fixed packed training batches.

Takes the per-window samples the datasets yield (padded ids + attention
mask + per-window metadata) and emits fixed-shape packed batches for
``CM3PModule.forward_packed``: rows of ``seq_len`` tokens with segment IDs,
a padded window table (``window_valid`` marks real windows), aligned
metadata tensors, and packed MLM labels when present.

Shapes are fully static per (rows, max_windows) configuration, so one
compiled step serves every batch.
"""
from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from ..processing.packing import pack_windows


def packed_batches(
    samples: Iterator[dict],
    rows: int,
    seq_len: int,
    pad_id: int,
    max_windows: Optional[int] = None,
    drop_last: bool = True,
) -> Iterator[dict]:
    """Greedily fill ``rows`` packed rows per batch, then emit."""
    max_windows = max_windows or rows * 8
    pending: list[dict] = []
    filled = 0
    capacity = rows * seq_len

    def emit(batch_samples: list[dict]):
        """Yield one or more fixed-shape batches (splits on fragmentation)."""
        seqs = []
        label_seqs = []
        for s in batch_samples:
            length = int(np.asarray(s["attention_mask"]).sum())
            seqs.append(np.asarray(s["input_ids"])[:length])
            if "labels" in s and np.asarray(s["labels"]).ndim == 1:
                label_seqs.append(np.asarray(s["labels"])[:length])
        packed = pack_windows(seqs, seq_len, pad_id)
        n_rows = packed["input_ids"].shape[0]
        if n_rows > rows and len(batch_samples) > 1:
            # first-fit fragmentation overflowed the fixed row budget: split
            mid = len(batch_samples) // 2
            yield from emit(batch_samples[:mid])
            yield from emit(batch_samples[mid:])
            return
        w = len(seqs)

        input_ids = np.full((rows, seq_len), pad_id, np.int32)
        segment_ids = np.zeros((rows, seq_len), np.int32)
        input_ids[:n_rows] = packed["input_ids"]
        segment_ids[:n_rows] = packed["segment_ids"]

        window_rows = np.zeros(max_windows, np.int32)
        window_segments = np.full(max_windows, -1, np.int32)
        window_valid = np.zeros(max_windows, np.int32)
        window_rows[:w] = packed["window_to_row"]
        window_segments[:w] = packed["window_segment"]
        window_valid[:w] = 1

        batch = {
            "input_ids": input_ids,
            "segment_ids": segment_ids,
            "window_rows": window_rows,
            "window_segments": window_segments,
            "window_valid": window_valid,
        }

        if label_seqs:
            labels = np.full((rows, seq_len), -100, np.int32)
            for wi, lab in enumerate(label_seqs):
                r = packed["window_to_row"][wi]
                off = packed["window_offset"][wi]
                labels[r, off : off + len(lab)] = lab
            batch["labels"] = labels

        if "input_features" in batch_samples[0]:
            f0 = np.asarray(batch_samples[0]["input_features"])
            features = np.zeros((max_windows,) + f0.shape, np.float32)
            for wi, s in enumerate(batch_samples):
                features[wi] = s["input_features"]
            batch["input_features"] = features

        if "metadata_ids" in batch_samples[0]:
            m0 = np.asarray(batch_samples[0]["metadata_ids"])
            meta_shape = (max_windows,) + m0.shape
            metadata_ids = np.zeros(meta_shape, np.int32)
            metadata_mask = np.zeros(meta_shape, np.int32)
            for wi, s in enumerate(batch_samples):
                metadata_ids[wi] = s["metadata_ids"]
                metadata_mask[wi] = s["metadata_attention_mask"]
            batch["metadata_ids"] = metadata_ids
            batch["metadata_attention_mask"] = metadata_mask
            if "metadata_variation_classes" in batch_samples[0]:
                v = np.asarray(batch_samples[0]["metadata_variation_classes"]).shape[0]
                classes = np.full((max_windows, v), -1, np.int32)
                for wi, s in enumerate(batch_samples):
                    classes[wi] = s["metadata_variation_classes"]
                # dummy windows keep class -1 everywhere; give them a class-0
                # slot so argmax is well-defined (row is masked from the loss)
                classes[len(batch_samples):, 0] = 0
                batch["metadata_variation_classes"] = classes
        yield batch

    for sample in samples:
        length = int(np.asarray(sample["attention_mask"]).sum())
        length = min(length, seq_len)
        would_overflow = filled + length > capacity or len(pending) + 1 > max_windows
        if would_overflow and pending:
            yield from emit(pending)
            pending, filled = [], 0
        pending.append(sample)
        filled += length

    if pending and not drop_last:
        yield from emit(pending)
