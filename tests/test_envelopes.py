import numpy as np
import jax.numpy as jnp
import pytest

from phonic_tpu.ops import ahdsr, envelope, fader, lfo

import reference_dsp as ref

SR = 48000


# ---------------------------------------------------------------------------
# AHDSR
# ---------------------------------------------------------------------------


def run_ref_ahdsr(attack, hold, decay, sustain, release, volume, n, note_off_at=None):
    env = ref.Ahdsr(SR, attack, hold, decay, sustain, release)
    env.note_on(volume)
    out = np.empty(n, np.float32)
    for i in range(n):
        if note_off_at is not None and i == note_off_at:
            env.note_off()
        out[i] = env.run()
    return out


@pytest.mark.parametrize(
    "attack,hold,decay,sustain,release",
    [
        (0.01, 0.0, 0.1, 0.5, 0.2),
        (0.0, 0.05, 0.1, 0.75, 0.1),  # skipped attack + hold
        (0.002, 0.01, 0.0, 0.6, 0.05),  # zero decay
        (0.05, 0.0, 0.2, 0.0, 0.3),  # sustain 0
        (0.01, 0.0, 0.1, 0.9, 0.0),  # zero release (hard cut)
    ],
)
def test_ahdsr_against_reference_machine(attack, hold, decay, sustain, release):
    n = SR // 4
    note_off_at = n // 2
    p = ahdsr.ahdsr_params(SR, attack, hold, decay, sustain, release)
    got = np.asarray(ahdsr.ahdsr_block(p, 0.8, 0, note_off_at, n))
    expected = run_ref_ahdsr(attack, hold, decay, sustain, release, 0.8, n, note_off_at)
    # closed form vs f32 accumulation: tolerance covers the reference's drift;
    # at the -60 dB release cutoff the snap-to-zero may land one sample apart
    body = expected > 2 * ahdsr.SILENCE
    np.testing.assert_allclose(got[body], expected[body], atol=3e-4)
    np.testing.assert_allclose(got[~body], expected[~body], atol=1.5 * ahdsr.SILENCE)


def test_ahdsr_block_splits_are_equivalent():
    # rendering in blocks with carried ages == rendering in one go
    p = ahdsr.ahdsr_params(SR, 0.01, 0.005, 0.1, 0.5, 0.2)
    n, b = 8192, 2048
    whole = np.asarray(ahdsr.ahdsr_block(p, 1.0, 0, 3000, n))
    parts = [
        np.asarray(ahdsr.ahdsr_block(p, 1.0, i, 3000, b)) for i in range(0, n, b)
    ]
    np.testing.assert_allclose(whole, np.concatenate(parts), atol=1e-6)


def test_ahdsr_vmapped_voices():
    import jax

    p = ahdsr.ahdsr_params(SR, 0.01, 0.0, 0.05, 0.5, 0.1)
    volumes = jnp.array([0.2, 0.5, 1.0])
    ages = jnp.array([0, 100, -50])  # third voice starts mid-block
    rel = jnp.array([jnp.inf, 500.0, jnp.inf])
    out = jax.vmap(lambda v, a, r: ahdsr.ahdsr_block(p, v, a, r, 256))(volumes, ages, rel)
    assert out.shape == (3, 256)
    assert float(out[2, 0]) == 0.0  # not yet started
    assert float(out[2, 100]) > 0.0  # starts at sample 50... attack begins


def test_ahdsr_attack_scaling_monotone():
    p0 = ahdsr.ahdsr_params(SR, 0.05, 0.0, 0.1, 0.5, 0.1, attack_scaling=0.0)
    p1 = ahdsr.ahdsr_params(SR, 0.05, 0.0, 0.1, 0.5, 0.1, attack_scaling=0.9)
    n = int(0.05 * SR) + 500  # past the attack stage
    a0 = np.asarray(ahdsr.ahdsr_block(p0, 1.0, 0, np.inf, n))
    a1 = np.asarray(ahdsr.ahdsr_block(p1, 1.0, 0, np.inf, n))
    # positive scaling = faster start
    assert a1[200] > a0[200]
    # scaling only shapes the attack curve; post-attack both follow the same
    # (unscaled) decay trajectory
    np.testing.assert_allclose(a1[int(0.05 * SR) + 10:], a0[int(0.05 * SR) + 10:], atol=1e-5)


# ---------------------------------------------------------------------------
# Envelope follower
# ---------------------------------------------------------------------------


def test_follower_matches_reference():
    rng = np.random.default_rng(7)
    x = np.abs(rng.normal(size=4096)).astype(np.float32)
    ac = float(envelope.follower_coef(0.01, SR))
    rc = float(envelope.follower_coef(0.1, SR))
    _, y = envelope.follower_block(0.0, jnp.asarray(x), ac, rc)
    expected = ref.envelope_follower(x, np.float32(ac), np.float32(rc))
    np.testing.assert_allclose(np.asarray(y), expected, atol=1e-5)


def test_follower_batched():
    x = jnp.ones((4, 128)) * jnp.linspace(0, 1, 128)
    y_end, y = envelope.follower_block(jnp.zeros(4), x, 0.9, 0.99)
    assert y.shape == (4, 128)
    np.testing.assert_allclose(np.asarray(y_end), np.asarray(y[:, -1]))


# ---------------------------------------------------------------------------
# LFO
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "wf_id,wf_name",
    [(lfo.SINE, "sine"), (lfo.TRIANGLE, "triangle"), (lfo.RAMP_UP, "ramp_up"),
     (lfo.RAMP_DOWN, "ramp_down"), (lfo.SQUARE, "square")],
)
def test_lfo_deterministic_waveforms(wf_id, wf_name):
    n = 4096
    inc = 3.3 / SR  # 3.3 Hz
    state = lfo.lfo_init(0.1)
    _, y = lfo.lfo_block(state, wf_id, inc, n)
    expected = ref.lfo_run(wf_name, 0.1, inc, n)
    np.testing.assert_allclose(np.asarray(y), expected, atol=2e-4)


def test_lfo_state_carry():
    n = 1024
    inc = 10.0 / SR
    state = lfo.lfo_init()
    _, whole = lfo.lfo_block(state, lfo.SINE, inc, 2 * n)
    state = lfo.lfo_init()
    state, a = lfo.lfo_block(state, lfo.SINE, inc, n)
    _, b = lfo.lfo_block(state, lfo.SINE, inc, n)
    np.testing.assert_allclose(np.concatenate([a, b]), np.asarray(whole), atol=1e-4)


def test_lfo_random_reproducible_and_bounded():
    state = lfo.lfo_init()
    _, y1 = lfo.lfo_block(state, lfo.RANDOM, 100.0 / SR, 4096, seed=42)
    _, y2 = lfo.lfo_block(state, lfo.RANDOM, 100.0 / SR, 4096, seed=42)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.all(np.abs(np.asarray(y1)) <= 1.0)
    # S&H: value constant between wraps, changes at wraps
    assert len(np.unique(np.asarray(y1))) > 4


def test_lfo_smooth_random_continuous():
    _, y = lfo.lfo_block(lfo.lfo_init(), lfo.SMOOTH_RANDOM, 5.0 / SR, 48000, seed=1)
    d = np.abs(np.diff(np.asarray(y)))
    assert d.max() < 0.01  # no jumps


# ---------------------------------------------------------------------------
# Fader
# ---------------------------------------------------------------------------


def test_fader_fade_out_matches_reference():
    n = 8192
    f = ref.Fader(SR)
    f.start(1.0, 0.0, 0.05)
    expected = f.gains(n)

    state = fader.fader_init()
    state = fader.fader_start(state, 1.0, 0.0, 0.05, SR)
    state, gains = fader.fader_block(state, n)
    np.testing.assert_allclose(np.asarray(gains), expected, atol=2e-4)
    assert int(state.mode) == fader.FINISHED


def test_fader_stopped_is_unity():
    state, gains = fader.fader_block(fader.fader_init(), 64)
    np.testing.assert_array_equal(np.asarray(gains), 1.0)
    assert int(state.mode) == fader.STOPPED


def test_fader_zero_duration_jumps():
    state = fader.fader_start(fader.fader_init(), 1.0, 0.0, 0.0, SR)
    state, gains = fader.fader_block(state, 16)
    np.testing.assert_array_equal(np.asarray(gains), 0.0)
