"""Voice-steal policy parity: random out-of-order note schedules replayed
against an independent host oracle of the reference's voice selection
(reference: src/generator/sampler.rs:826-860, next_free_voice_index).

The oracle transcribes the reference algorithm directly:
  - first completely free voice by index, else
  - with an envelope, the longest-releasing voice (earliest release start;
    without envelope parameters the release stage is never consulted), else
  - the oldest active voice by playback id.
The voice-end model (when a voice counts as free) is shared with the
implementation (`Sampler._voice_end`) so this test isolates the *selection*
policy."""

import math
import random

import numpy as np
import pytest

from phonic_tpu import AudioFileBuffer
from phonic_tpu.generators.base import GeneratorPlaybackOptions
from phonic_tpu.generators.sampler import AhdsrConfig, Sampler

SR = 48000


def tone_buffer(frames=24000):
    x = np.zeros(frames, np.float32)
    return AudioFileBuffer.from_array(x[None, :], SR)


def oracle_assignment(sampler, events, num_voices):
    """Replay ``events`` (time-sorted (time, kind, note, note_id) tuples)
    through the reference selection algorithm; returns note_id -> voice."""
    voices = [None] * num_voices  # last _Segment-like dict per voice
    assign = {}
    by_id = {}
    for t, kind, note, nid in events:
        if kind == "off":
            seg = by_id.get(nid)
            if seg is not None and seg["release"] is math.inf:
                seg["release"] = float(max(t, seg["start"]))
            continue
        # --- next_free_voice_index (sampler.rs:826-860) ---
        idx = None
        for v in range(num_voices):
            seg = voices[v]
            if seg is None or sampler._voice_end(_as_segment(seg), SR) <= t:
                idx = v
                break
        if idx is None:
            earliest_release = None
            oldest_active = None
            candidate = 0
            for v in range(num_voices):
                seg = voices[v]
                releasing = (sampler.envelope is not None
                             and seg["release"] <= t)
                if releasing:
                    if earliest_release is None or seg["release"] < earliest_release:
                        earliest_release = seg["release"]
                        oldest_active = None
                        candidate = v
                elif earliest_release is None:
                    if oldest_active is None or seg["note_id"] < oldest_active:
                        oldest_active = seg["note_id"]
                        candidate = v
            idx = candidate
        voices[idx] = {"start": t, "note": note, "note_id": nid,
                       "release": math.inf}
        by_id[nid] = voices[idx]
        assign[nid] = idx
    return assign


def _as_segment(d):
    from phonic_tpu.generators.sampler import _Segment
    s = _Segment(d["start"], d["note"], d["note_id"], 1.0, 0.0)
    s.release = d["release"]
    return s


def impl_assignment(sampler):
    voices = sampler._allocate(SR)
    assign = {}
    for v, segs in enumerate(voices):
        for seg in segs:
            assign[seg.note_id] = v
    return assign


@pytest.mark.parametrize("envelope", [None, AhdsrConfig(release=0.2)])
@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_steal_matches_reference_oracle(envelope, seed):
    rng = random.Random(seed)
    num_voices = rng.choice([2, 3, 4])
    s = Sampler(tone_buffer(), GeneratorPlaybackOptions(voices=num_voices),
                envelope=envelope)
    # out-of-order scheduling: playback ids are allocated in CALL order
    # while event times are arbitrary — exactly the case where a
    # start-time-based policy would diverge from the reference's
    # playback-id policy
    calls = []
    for _ in range(40):
        t = rng.randrange(0, 96000)
        note = rng.randrange(48, 72)
        nid = s.note_on(note, time=t)
        calls.append((t, "on", note, nid))
        if rng.random() < 0.6:
            off_t = t + rng.randrange(100, 30000)
            s.note_off(nid, time=off_t)
            calls.append((off_t, "off", note, nid))
    events = sorted(calls, key=lambda e: (e[0], e[3]))
    expected = oracle_assignment(s, events, num_voices)
    got = impl_assignment(s)
    assert got == expected, (
        f"voice assignment diverged from reference policy "
        f"(seed={seed}, envelope={envelope is not None})")
