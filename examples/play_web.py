"""Browser playback: stream the live render over HTTP (the analog of the
reference's emscripten/WebAudio example, examples/play-emscripten/).

Starts a WebOutput HTTP server and plays a synth sequence through it;
open the printed URL in any browser — the page's <audio> element plays the
endless float32 WAV stream.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from common import demo_buffer, make_parser

from phonic_tpu import synths
from phonic_tpu.generators.base import GeneratorPlaybackOptions
from phonic_tpu.generators.synth import SynthGenerator
from phonic_tpu.outputs.web import WebOutput
from phonic_tpu.player import Player, PlayerConfig
from phonic_tpu.sources.file import FilePlaybackOptions


def main():
    p = make_parser("browser playback over HTTP")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--seconds", type=float, default=0.0,
                   help="stop after N seconds (0 = run until Ctrl-C)")
    args = p.parse_args()
    if args.output:
        raise SystemExit("play_web streams to browsers; use play_file for -o")

    out = WebOutput(args.sample_rate, 2, host="0.0.0.0", port=args.port)
    player = Player(out, PlayerConfig(block_frames=args.block))

    player.play_file(demo_buffer(args.sample_rate, freq=110.0, secs=2.0,
                                 decay=0.5),
                     FilePlaybackOptions(repeat=None, volume=0.5,
                                         fade_out_secs=0.0))
    gen = SynthGenerator(synths.organ(), GeneratorPlaybackOptions(voices=4),
                         release_secs=0.4)
    h = player.play_generator(gen)
    sr = args.sample_rate
    for bar in range(64):
        base = bar * 2 * sr
        for i, note in enumerate((60, 64, 67, 64)):
            t0 = base + i * sr // 2
            nid = h.note_on(note, volume=0.5, at=t0)
            h.note_off(nid, at=t0 + sr // 3)

    player.run_async()
    print(f"streaming at {out.url}  (open in a browser; Ctrl-C stops)")
    try:
        if args.seconds > 0:
            time.sleep(args.seconds)
        else:
            while True:
                time.sleep(1.0)
    except KeyboardInterrupt:
        pass
    player.close()


if __name__ == "__main__":
    main()
