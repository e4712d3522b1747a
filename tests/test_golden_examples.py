"""Golden fixtures: every example renders offline (-o) and is diffed
against a committed fingerprint (the reference's example-as-fixture
strategy; its examples take the same -o switch).

The fingerprint is per-4096-block stereo RMS (rounded), robust to ulp-level
backend drift while catching any real change in rendered audio.  Regenerate
with:  python tests/test_golden_examples.py --regen
"""

import json
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

ROOT = Path(__file__).resolve().parent.parent
GOLDEN = Path(__file__).resolve().parent / "goldens" / "examples.json"

EXAMPLES = {
    "play_file": ["-o", "{out}"],
    "play_sequence": ["-o", "{out}"],
    "play_grains": ["-o", "{out}"],
    "play_synth": ["-o", "{out}"],
    "play_custom": ["-o", "{out}"],
    "play_graph": ["-o", "{out}", "--seconds", "2", "--submixers", "2",
                   "--sources-per-mixer", "2"],
}


def fingerprint(path) -> list:
    from phonic_tpu.io.wav import read_wav

    audio, info = read_wav(path)
    x = np.asarray(audio, np.float64)
    n = (x.shape[1] // 4096) * 4096
    blocks = x[:, :n].reshape(x.shape[0], -1, 4096)
    rms = np.sqrt(np.mean(blocks**2, axis=-1))  # [ch, nblocks]
    return [info.frames] + [round(float(v), 4) for v in rms.reshape(-1)]


def render_example(name: str, tmp_path: Path) -> Path:
    out = tmp_path / f"{name}.wav"
    argv = [str(ROOT / "examples" / f"{name}.py")] + [
        a.format(out=out) for a in EXAMPLES[name]
    ]
    old_argv = sys.argv
    sys.argv = argv
    try:
        runpy.run_path(argv[0], run_name="__main__")
    finally:
        sys.argv = old_argv
    return out


@pytest.mark.parametrize("name", sorted(EXAMPLES))
def test_example_matches_golden(name, tmp_path):
    goldens = json.loads(GOLDEN.read_text())
    assert name in goldens, f"no golden for {name}; run --regen"
    out = render_example(name, tmp_path)
    got = fingerprint(out)
    want = goldens[name]
    assert got[0] == want[0], f"{name}: length {got[0]} != {want[0]}"
    np.testing.assert_allclose(got[1:], want[1:], atol=2e-3,
                               err_msg=f"{name} fingerprint drifted")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        import tempfile

        tmp = Path(tempfile.mkdtemp())
        out = {}
        for name in sorted(EXAMPLES):
            print(f"rendering {name} ...", flush=True)
            out[name] = fingerprint(render_example(name, tmp))
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(out, indent=1))
        print(f"wrote {GOLDEN}")
