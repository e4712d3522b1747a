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
