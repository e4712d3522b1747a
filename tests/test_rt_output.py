"""Native realtime bridge: ring buffer pacing and lifecycle."""

import time

import numpy as np
import pytest

from phonic_tpu.outputs.rt import RtOutput, rt_available


@pytest.mark.skipif(not rt_available(), reason="native bridge not built")
def test_ring_paces_and_counts():
    out = RtOutput(48000, 2, buffer_secs=0.1, try_alsa=False)
    try:
        block = np.zeros((2, 4800), np.float32)  # 100 ms
        t0 = time.monotonic()
        for _ in range(5):  # 500 ms of audio into a 100 ms ring
            out.write(block)
        elapsed = time.monotonic() - t0
        # the ring must have back-pressured the writer near realtime
        assert elapsed > 0.25, elapsed
        time.sleep(0.05)
        assert out.sample_position > 4800
    finally:
        out.close()


@pytest.mark.skipif(not rt_available(), reason="native bridge not built")
def test_pause_resume():
    out = RtOutput(48000, 2, buffer_secs=0.5, try_alsa=False)
    try:
        out.write(np.zeros((2, 9600), np.float32))
        out.pause()
        time.sleep(0.05)
        p1 = out.sample_position
        time.sleep(0.15)
        assert out.sample_position == p1  # frozen while paused
        out.resume()
        time.sleep(0.15)
        assert out.sample_position > p1
    finally:
        out.close()


def test_list_alsa_devices_graceful():
    """Enumeration returns a list (possibly empty in a headless container)
    without raising; entries are (name, desc) string pairs."""
    from phonic_tpu.outputs.rt import list_alsa_devices

    devs = list_alsa_devices()
    assert isinstance(devs, list)
    for name, desc in devs:
        assert isinstance(name, str) and isinstance(desc, str)


def test_rt_output_named_device_falls_back():
    """A bogus device name must not crash: ALSA open fails, the null
    consumer keeps draining."""
    from phonic_tpu.outputs.rt import RtOutput, rt_available
    import numpy as np
    import pytest as _pytest

    if not rt_available():
        _pytest.skip("native bridge not built")
    out = RtOutput(48000, 2, buffer_secs=0.05, device="no-such-pcm-device")
    assert not out.uses_alsa
    out.write(np.zeros((2, 256), np.float32))
    out.close()


@pytest.mark.skipif(not rt_available(), reason="native bridge not built")
def test_sample_format_conversion():
    """The consumer thread's f32->i16/i32 converters (reference sample-format
    dispatch, src/output/cpal.rs:509-561): exact endpoints, clipping,
    round-to-nearest."""
    from phonic_tpu.outputs.rt import convert_f32

    x = np.array([0.0, 1.0, -1.0, 2.0, -2.0, 0.5, -0.25, 1.0 / 32767.0],
                 np.float32)
    s16 = convert_f32(x, "i16")
    assert s16.dtype == np.int16
    assert s16[0] == 0 and s16[1] == 32767 and s16[2] == -32767
    assert s16[3] == 32767 and s16[4] == -32767  # clipped
    assert s16[5] == round(0.5 * 32767) and s16[7] == 1

    s32 = convert_f32(x, "i32")
    assert s32.dtype == np.int32
    assert s32[0] == 0 and s32[1] == 2147483647 and s32[2] == -2147483647
    assert s32[3] == 2147483647 and s32[4] == -2147483647
    assert abs(int(s32[5]) - round(0.5 * 2147483647)) <= 1

    f = convert_f32(x, "f32")
    np.testing.assert_array_equal(f, x)

    # round-trip accuracy on a signal: i16 quantization noise only
    sig = (0.9 * np.sin(np.linspace(0, 20, 1000))).astype(np.float32)
    back = convert_f32(sig, "i16").astype(np.float32) / 32767.0
    assert np.max(np.abs(back - sig)) < 1.0 / 32000


@pytest.mark.skipif(not rt_available(), reason="native bridge not built")
def test_open_with_config_and_format_introspection():
    from phonic_tpu.outputs.rt import RtOutputConfig

    out = RtOutput.open_with_config(RtOutputConfig(
        sample_rate=44100, channels=2, buffer_size=8820, try_alsa=False))
    try:
        assert out.sample_rate == 44100
        assert out.channel_count == 2
        assert out.sample_format in ("f32", "i32", "i16")
        assert not out.uses_alsa  # no sound hardware in this env
    finally:
        out.close()
