"""Multi-chip lane sharding on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from phonic_tpu import (AudioFileBuffer, EngineConfig, FilePlaybackOptions,
                        FileSource, Mixer, RenderProgram)
from phonic_tpu.parallel.mesh import BatchedRenderProgram, data_mesh

SR = 48000


def make_prog():
    t = np.arange(SR // 2) / SR
    buf = AudioFileBuffer.from_array(
        (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)[None, :], SR)
    m = Mixer("main")
    m.add_source(FileSource(buf, FilePlaybackOptions(repeat=None, fade_out_secs=0.0)))
    return RenderProgram(m, EngineConfig(sample_rate=SR, block_frames=1024))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_lanes_match_single():
    prog = make_prog()
    mesh = data_mesh(8)
    batched = BatchedRenderProgram(prog, lanes=8, mesh=mesh)
    out = batched.render(4096)
    assert out.shape == (8, 2, 4096)
    # every lane identical to the unsharded render
    single = make_prog().render(duration_frames=4096)
    for lane in range(8):
        np.testing.assert_allclose(out[lane], single, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mixdown_collective():
    prog = make_prog()
    batched = BatchedRenderProgram(prog, lanes=8, mesh=data_mesh(8), mixdown=True)
    states = batched.init_states()
    _, audio = batched.step(states, batched.block_inputs(0))
    assert audio.shape == (1, 2, 1024)
    single = make_prog().render(duration_frames=1024)
    np.testing.assert_allclose(np.asarray(audio[0]), 8.0 * single, atol=1e-4)
