"""Property tests for glide chaining (TODO quality item): random sequences
of instant sets and glides on a timeline must match a host oracle that
replays the reference's per-64-frame speed stepping
(src/source/file/common.rs:141-169) sample by sample."""

import math

import numpy as np
import pytest

from phonic_tpu.events import (GLIDE_CHUNK_FRAMES, GLIDE_KNOT_FRAMES,
                               ParamTimeline)

SR = 48000


def _oracle(events, n, initial):
    """Per-sample oracle: replay instant sets and glides with the
    reference's chunked stepping.  events: sorted (time, kind, target,
    rate)."""
    out = np.empty(n, np.float64)
    current = float(initial)
    target = None
    rate = 0.0
    start = 0  # glide start: chunk recomputes align to it (common.rs:56)
    ev = 0
    for i in range(n):
        while ev < len(events) and events[ev][0] <= i:
            t, kind, tgt, r = events[ev]
            if kind == "set" or r <= 0.0 or current <= 0.0 or tgt <= 0.0 \
                    or abs(tgt - current) <= 1e-4:
                current = float(tgt)
                target = None
            else:
                target = float(tgt)
                rate = float(r)
                start = t
            ev += 1
        if target is not None and (i - start) % GLIDE_CHUNK_FRAMES == 0:
            # chunk-start recompute (common.rs:141-169)
            semitones = abs(12.0 * math.log2(target / current))
            dur = semitones / rate * SR
            if dur <= 0.0:
                current = target
                target = None
            else:
                s = (target - current) / dur * GLIDE_CHUNK_FRAMES
                if abs(target - current) < abs(s):
                    current = target
                    target = None
                else:
                    current += s
                    if abs(target - current) <= 1e-4:
                        current = target
                        target = None
        out[i] = current
    return out


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_random_glide_and_set_sequences_match_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 48000
    initial = float(rng.uniform(0.5, 2.0))
    tl = ParamTimeline(initial=initial)
    events = []
    t = 0
    while t < n - 2000:
        t += int(rng.integers(500, 12000))
        tgt = float(rng.uniform(0.25, 4.0))
        if rng.random() < 0.4:
            events.append((t, "set", tgt, 0.0))
        else:
            events.append((t, "glide", tgt, float(rng.uniform(2.0, 60.0))))
    for at, kind, tgt, rate in events:
        if kind == "set":
            tl.set_at(at, tgt)
        else:
            tl.set_glide_at(at, tgt, rate, SR)

    want = _oracle(events, n, initial)
    # compare on the reference's own 64-frame update grid.  The lowering
    # plants knots every GLIDE_KNOT_FRAMES and lerps between them, so the
    # allowed deviation at any point is the oracle's own excursion within
    # one knot window (plus float noise); where the oracle is flat the
    # timeline must be exact.
    ts = np.arange(0, n, GLIDE_CHUNK_FRAMES)
    got = np.array([tl.value_at(int(i) + 1) for i in ts])
    w = want[ts]
    err = np.abs(got - w)
    # two knot intervals of slack: the lowering lerps between 512-frame
    # knots and a knot can lag the staircase by up to one more interval
    half = 2 * GLIDE_KNOT_FRAMES // GLIDE_CHUNK_FRAMES + 1
    hi = np.copy(w)
    lo = np.copy(w)
    for s in range(-half, half + 1):
        sh = np.roll(w, s)
        if s > 0:
            sh[:s] = w[0]
        elif s < 0:
            sh[s:] = w[-1]
        hi = np.maximum(hi, sh)
        lo = np.minimum(lo, sh)
    slack = (hi - lo) + np.maximum(2e-3 * np.abs(w), 2e-4)
    assert np.all(err <= slack), (
        seed, float(err.max()), int(ts[np.argmax(err - slack)]))


def test_glide_interrupted_by_set_snaps():
    tl = ParamTimeline(initial=1.0)
    tl.set_glide_at(0, 4.0, 6.0, SR)    # slow glide upward
    tl.set_at(10000, 0.5)               # hard set mid-glide
    assert abs(tl.value_at(9999) - 1.0) > 1e-3   # glide moved
    assert tl.value_at(10001) == 0.5             # snap wins
    # no later knots resurrect the old glide
    assert tl.value_at(47999) == 0.5


def test_glide_chain_retargets_from_current_value():
    tl = ParamTimeline(initial=1.0)
    tl.set_glide_at(0, 2.0, 12.0, SR)     # ~1 s to reach +12 st
    mid = tl.value_at(24000)
    assert 1.0 < mid < 2.0
    tl.set_glide_at(24000, 0.5, 12.0, SR)  # retarget downward mid-flight
    after = tl.value_at(24000 + 4800)
    assert after < mid                      # immediately heads down
    assert abs(tl.value_at(24000 + 5 * SR) - 0.5) < 1e-3  # converges
