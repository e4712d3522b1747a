"""Host-side event timelines lowered to per-block device tensors.

The reference delivers control changes through lock-free queues drained at
block boundaries, then splits the render block at event sample times
(src/source/mixed.rs:659-719).  The TPU engine instead *lowers* each
parameter's scheduled events into fixed-shape per-block segment tensors
(`SegmentEvents`: times[K] + values[K]) consumed by the closed-form
smoothers in ops/smoothing.py — sample-accurate automation with static
shapes and no per-sample control flow.

If a block receives more than K events, the earliest K-1 are kept plus the
final one, so the end-of-block state is always exact; intermediate
over-K events collapse into their neighbours (K is configurable,
EngineConfig.max_events_per_block).
"""

from __future__ import annotations

import bisect
import dataclasses

import numpy as np


@dataclasses.dataclass
class ParamTimeline:
    """Sorted (sample_time, value) automation for one parameter."""

    initial: float
    times: list = dataclasses.field(default_factory=list)
    values: list = dataclasses.field(default_factory=list)

    def set_at(self, sample_time: int, value: float):
        """Schedule a target change at an absolute sample time.  Events at
        duplicate times overwrite in arrival order (stable)."""
        i = bisect.bisect_right(self.times, sample_time)
        self.times.insert(i, int(sample_time))
        self.values.insert(i, float(value))

    def value_at(self, sample_time: int) -> float:
        """Target value in effect at (just before) ``sample_time``."""
        i = bisect.bisect_right(self.times, int(sample_time) - 1)
        return self.values[i - 1] if i > 0 else self.initial

    def lower_block(self, block_start: int, block_len: int, max_events: int):
        """-> (times int32[K], values float32[K]) with in-block frame offsets;
        unused slots padded with time == block_len."""
        lo = bisect.bisect_left(self.times, block_start)
        hi = bisect.bisect_left(self.times, block_start + block_len)
        times = self.times[lo:hi]
        values = self.values[lo:hi]
        if len(times) > max_events:
            times = times[: max_events - 1] + [times[-1]]
            values = values[: max_events - 1] + [values[-1]]
        out_t = np.full(max_events, block_len, np.int32)
        out_v = np.zeros(max_events, np.float32)
        out_t[: len(times)] = np.asarray(times, np.int64) - block_start
        out_v[: len(values)] = values
        return out_t, out_v

    def lower_all(self, num_blocks: int, block_len: int, max_events: int):
        """Stacked lowering for offline scan-over-blocks renders:
        -> (times int32[B, K], values float32[B, K])."""
        ts = np.empty((num_blocks, max_events), np.int32)
        vs = np.empty((num_blocks, max_events), np.float32)
        for b in range(num_blocks):
            ts[b], vs[b] = self.lower_block(b * block_len, block_len, max_events)
        return ts, vs
