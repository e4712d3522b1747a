"""Property tests for the host-side voice allocator (steal policy).

Behavioural spec: reference src/generator/sampler.rs:826-860 — a note-on
takes a free voice first; otherwise steals the voice whose note released
earliest; otherwise steals the voice with the OLDEST note id.  Random note
storms are replayed against a brute-force oracle of those rules.
"""

import math
import random

from phonic_tpu.generators.base import GeneratorPlaybackOptions
from phonic_tpu.generators.sampler import AhdsrConfig, Sampler

import numpy as np

SR = 48000


def make_sampler(voices):
    buf_frames = SR  # 1 s one-shot
    from phonic_tpu.io.decoder import AudioFileBuffer

    buf = AudioFileBuffer.from_array(np.zeros((1, buf_frames), np.float32), SR)
    return Sampler(buf, envelope=AhdsrConfig(attack=0.0, release=0.1),
                   options=GeneratorPlaybackOptions(voices=voices))


def oracle_allocate(events, voices, release_secs=0.1, sr=SR):
    """Brute-force replay of the reference steal policy.  Returns for every
    note-on event the voice index it landed on."""
    # voice state: (busy_until, release_frame_or_inf, note_id, start)
    state = [None] * voices
    placements = []
    by_id = {}
    for ev in sorted(events, key=lambda e: (e[0], e[2])):
        t, kind, nid, *rest = ev
        if kind == "on":
            idx = None
            for v in range(voices):  # free voice: released env decayed
                s = state[v]
                if s is None or s["end"] <= t:
                    idx = v
                    break
            if idx is None:
                releasing = [(state[v]["rel"], v) for v in range(voices)
                             if state[v]["rel"] <= t]
                if releasing:
                    idx = min(releasing)[1]
                else:
                    idx = min(range(voices), key=lambda v: state[v]["nid"])
            state[idx] = {"nid": nid, "start": t, "rel": math.inf,
                          "end": math.inf}
            by_id[nid] = idx
            placements.append((nid, idx))
        elif kind == "off":
            v = by_id.get(nid)
            if v is not None and state[v] is not None \
                    and state[v]["nid"] == nid and state[v]["rel"] is math.inf:
                rel = max(t, state[v]["start"])
                state[v]["rel"] = rel
                state[v]["end"] = rel + release_secs * sr * 0.999 + 1
    return placements


def run_storm(seed, voices, n_events, max_time):
    rng = random.Random(seed)
    s = make_sampler(voices)
    events = []
    live = []
    t = 0
    for _ in range(n_events):
        t += rng.randint(0, max_time // n_events)
        if live and rng.random() < 0.4:
            nid = live.pop(rng.randrange(len(live)))
            s.note_off(nid, time=t)
            events.append((t, "off", nid))
        else:
            nid = s.note_on(rng.randint(40, 80), volume=1.0, time=t)
            live.append(nid)
            events.append((t, "on", nid))

    plan = s._allocate(SR)
    got = {}
    for vi, segs in enumerate(plan):
        for seg in segs:
            got[seg.note_id] = vi
    want = dict(oracle_allocate(events, voices))
    assert got.keys() == want.keys()
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, f"seed={seed}: {mismatches}"


def test_storm_small_pool():
    for seed in range(12):
        run_storm(seed, voices=3, n_events=40, max_time=4 * SR)


def test_storm_typical_pool():
    for seed in range(8):
        run_storm(100 + seed, voices=8, n_events=120, max_time=8 * SR)


def test_storm_dense_same_frame():
    """Many notes at the same frame: steals resolve by oldest note id."""
    for seed in range(8):
        run_storm(200 + seed, voices=4, n_events=30, max_time=2)


def test_steal_cuts_previous_note():
    s = make_sampler(1)
    a = s.note_on(60, time=0)
    b = s.note_on(64, time=100)
    plan = s._allocate(SR)
    segs = plan[0]
    assert [x.note_id for x in segs] == [a, b]
    assert segs[0].cut == 100  # hard-cut at the steal
