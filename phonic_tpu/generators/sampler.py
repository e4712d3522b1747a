"""Polyphonic sample-playback generator (the reference's flagship instrument).

Behavioural spec: reference src/generator/sampler.rs + sampler/voice.rs —
per-voice chain Panned<Amplified<ChannelMapped<PreloadedFileSource>>> with
AHDSR envelope; effective speed = speed_from_note(note) *
2^(transpose/12 + finetune/1200) (voice.rs:144-157); effective volume =
base * note velocity, panning = clamp(base + note) (voice.rs:158-161);
envelope triggered at full volume (velocity scales the amplifier);
voice stealing free -> longest-releasing -> oldest (sampler.rs:826-860);
FourCC parameters STRN/SFTN/SVOL/SPAN + AHDSR AENV/AHLD/ADEC/ASUS/AREL.

TPU formulation: the host-side allocator replays the reference's steal
policy over the scheduled note timeline and lowers each block into per-voice
tensors: one *continuing* note descriptor plus at most one *retrigger*
(steal) descriptor.  The voice bank renders as two masked lanes under vmap —
sample positions are analytic cumsums, envelopes are the closed-form AHDSR —
so a steal mid-block is exact: the old note's tail renders up to the
trigger, the new note from it.

Known deviations: AHDSR parameter changes re-shape the envelope of already
sounding notes analytically (the reference mutates rates mid-trajectory);
more than one steal of the same voice within one block keeps only the last
note (raise EngineConfig.block alignment or voice count if that triggers).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..graph.nodes import BuildCtx
from ..io.decoder import AudioFileBuffer
from ..ops import ahdsr as ahdsr_ops
from ..ops import resample as rs
from ..ops.convert import panning_factors
from ..params import DecibelScaling, ExponentialScaling, FloatParameter, IntegerParameter, format_gain, format_pan
from .base import Generator, GeneratorPlaybackOptions

NEVER = np.iinfo(np.int32).max

TRANSPOSE = IntegerParameter("STRN", "Transpose", -48, 48, 0, unit="st")
FINETUNE = IntegerParameter("SFTN", "Finetune", -100, 100, 0, unit="ct")
VOLUME = FloatParameter("SVOL", "Volume", 1e-6, 15.848932, 1.0,
                        scaling=DecibelScaling(-60.0, 24.0), formatter=format_gain)
PANNING = FloatParameter("SPAN", "Panning", -1.0, 1.0, 0.0, formatter=format_pan)

# envelope parameters, 0..10 s exponentially scaled (sampler.rs:130-181)
ENV_ATTACK = FloatParameter("AENV", "Attack", 0.0, 10.0, 0.01, unit="s",
                            scaling=ExponentialScaling(3.0), smoothing=None)
ENV_HOLD = FloatParameter("AHLD", "Hold", 0.0, 10.0, 0.0, unit="s",
                          scaling=ExponentialScaling(3.0), smoothing=None)
ENV_DECAY = FloatParameter("ADEC", "Decay", 0.0, 10.0, 0.0, unit="s",
                           scaling=ExponentialScaling(3.0), smoothing=None)
ENV_SUSTAIN = FloatParameter("ASUS", "Sustain", 0.0, 1.0, 1.0, smoothing=None)
ENV_RELEASE = FloatParameter("AREL", "Release", 0.0, 10.0, 0.05, unit="s",
                             scaling=ExponentialScaling(3.0), smoothing=None)


@dataclasses.dataclass
class AhdsrConfig:
    attack: float = 0.01
    hold: float = 0.0
    decay: float = 0.0
    sustain: float = 1.0
    release: float = 0.05


@dataclasses.dataclass
class _Segment:
    start: int
    note: int
    note_id: int
    volume: float
    panning: float
    release: float = math.inf  # absolute frame of note-off
    cut: float = math.inf  # absolute frame where a steal hard-cuts the voice


class Sampler(Generator):
    PARAMS = (TRANSPOSE, FINETUNE, VOLUME, PANNING,
              ENV_ATTACK, ENV_HOLD, ENV_DECAY, ENV_SUSTAIN, ENV_RELEASE)

    def __init__(
        self,
        buffer: AudioFileBuffer,
        options: Optional[GeneratorPlaybackOptions] = None,
        envelope: Optional[AhdsrConfig] = None,
        transpose: int = 0,
        finetune: int = 0,
        name=None,
    ):
        super().__init__(options, name)
        self.buffer = buffer
        self.envelope = envelope
        self.transpose = int(transpose)
        self.finetune = int(finetune)
        self._plan_cache = None

    @property
    def WEIGHT(self):  # reference: weight = active voices (sampler.rs:970)
        return max(self.options.voices, 1)

    @classmethod
    def from_file(cls, path, **kwargs) -> "Sampler":
        return cls(AudioFileBuffer.from_file(path), **kwargs)

    def with_ahdsr(self, attack=0.01, hold=0.0, decay=0.0, sustain=1.0,
                   release=0.05) -> "Sampler":
        self.envelope = AhdsrConfig(attack, hold, decay, sustain, release)
        return self

    def param_initials(self):
        d = {TRANSPOSE.id: self.transpose, FINETUNE.id: self.finetune,
             VOLUME.id: self.options.volume, PANNING.id: self.options.panning}
        env = self.envelope or AhdsrConfig()
        d.update({ENV_ATTACK.id: env.attack, ENV_HOLD.id: env.hold,
                  ENV_DECAY.id: env.decay, ENV_SUSTAIN.id: env.sustain,
                  ENV_RELEASE.id: env.release})
        return d

    # ------------------------------------------------------------------
    # host-side voice allocation (reference steal policy, sampler.rs:826-860)
    # ------------------------------------------------------------------

    def _voice_end(self, seg: _Segment, ctx_sr: int) -> float:
        """Frame at which the voice becomes free again."""
        if self.envelope is not None:
            if seg.release is math.inf:
                return math.inf
            return min(seg.release + self.envelope.release * ctx_sr * 0.999 + 1, seg.cut)
        # no envelope: one-shot ends at buffer end (note speed scaled)
        speed = 2.0 ** ((seg.note - 60) / 12.0 + self.transpose / 12.0 + self.finetune / 1200.0)
        step = speed * self.buffer.sample_rate / ctx_sr  # source frames/output frame
        nat = seg.start + self.buffer.frames / max(step, 1e-9)
        if self.buffer.loop_range is not None:
            nat = math.inf
        end = nat
        if seg.release is not math.inf:
            end = min(end, seg.release + self.options.fade_out_secs * ctx_sr + 1)
        return min(end, seg.cut)

    def _allocate(self, sample_rate: int):
        """Replay the event timeline into per-voice segment lists."""
        if self._plan_cache is not None and self._plan_cache[0] == (
            len(self.events), sample_rate
        ):
            return self._plan_cache[1]
        voices: list[list[_Segment]] = [[] for _ in range(self.options.voices)]
        by_id: dict[int, _Segment] = {}
        events = sorted(self.events, key=lambda e: (e.time, e.note_id))
        for ev in events:
            t = ev.time
            if ev.kind == "on":
                # find a free voice, else steal
                idx = None
                for v, segs in enumerate(voices):
                    if not segs or self._voice_end(segs[-1], sample_rate) <= t:
                        idx = v
                        break
                if idx is None:
                    releasing = [
                        (segs[-1].release, v) for v, segs in enumerate(voices)
                        if segs[-1].release <= t
                    ]
                    if releasing:
                        idx = min(releasing)[1]
                    else:
                        idx = min(range(len(voices)),
                                  key=lambda v: voices[v][-1].note_id)
                last = voices[idx][-1] if voices[idx] else None
                if last is not None and self._voice_end(last, sample_rate) > t:
                    last.cut = min(last.cut, t)
                seg = _Segment(t, ev.note, ev.note_id, ev.volume, ev.panning)
                voices[idx].append(seg)
                by_id[ev.note_id] = seg
            elif ev.kind == "off":
                seg = by_id.get(ev.note_id)
                if seg is not None and seg.release is math.inf:
                    seg.release = float(max(t, seg.start))
            elif ev.kind == "all_off":
                for segs in voices:
                    for seg in segs:
                        if seg.start <= t and seg.release is math.inf:
                            seg.release = float(t)
        self._plan_cache = ((len(self.events), sample_rate), voices)
        return voices

    def duration_frames(self, ctx: BuildCtx) -> Optional[int]:
        voices = self._allocate(ctx.sample_rate)
        total = 0
        for segs in voices:
            for seg in segs:
                end = self._voice_end(seg, ctx.sample_rate)
                if end is math.inf:
                    return None
                total = max(total, int(end))
        return total

    def lower_block_inputs(self, block_start: int, block_len: int):
        voices = self._allocate(48000 if not hasattr(self, "_sr") else self._sr)
        v = self.options.voices
        out = {
            "_cont_active": np.zeros(v, np.float32),
            "_cont_note": np.full(v, 60.0, np.float32),
            "_cont_vol": np.zeros(v, np.float32),
            "_cont_pan": np.zeros(v, np.float32),
            "_cont_age0": np.zeros(v, np.int32),
            "_cont_rel": np.full(v, np.inf, np.float32),
            "_trig_time": np.full(v, block_len, np.int32),
            "_trig_note": np.full(v, 60.0, np.float32),
            "_trig_vol": np.zeros(v, np.float32),
            "_trig_pan": np.zeros(v, np.float32),
            "_trig_rel": np.full(v, np.inf, np.float32),
        }
        for vi, segs in enumerate(voices):
            cont = None
            trig = None
            for seg in segs:
                if seg.start < block_start and max(seg.cut, seg.start) > block_start:
                    cont = seg
                elif block_start <= seg.start < block_start + block_len:
                    trig = seg  # keep the last
            if cont is not None:
                out["_cont_active"][vi] = 1.0
                out["_cont_note"][vi] = cont.note
                out["_cont_vol"][vi] = cont.volume
                out["_cont_pan"][vi] = cont.panning
                out["_cont_age0"][vi] = block_start - cont.start
                if cont.release is not math.inf:
                    out["_cont_rel"][vi] = cont.release - cont.start
                # a cut without retrigger in this block: emulate via trig_time
                if cont.cut is not math.inf and cont.cut < block_start + block_len and trig is None:
                    out["_trig_time"][vi] = int(cont.cut) - block_start
            if trig is not None:
                out["_trig_time"][vi] = trig.start - block_start
                out["_trig_note"][vi] = trig.note
                out["_trig_vol"][vi] = trig.volume
                out["_trig_pan"][vi] = trig.panning
                if trig.release is not math.inf:
                    out["_trig_rel"][vi] = trig.release - trig.start
        return out

    # ------------------------------------------------------------------
    # device-side rendering
    # ------------------------------------------------------------------

    def init_state(self, ctx: BuildCtx):
        self._sr = ctx.sample_rate
        v = self.options.voices
        return {
            "base": jnp.zeros((v,), jnp.int32),
            "frac": jnp.zeros((v,), jnp.float32),
        }

    def _envelope_params(self, params):
        env0 = lambda pid: params[pid][0]
        return ahdsr_ops.ahdsr_params(
            self._sr, env0(ENV_ATTACK.id), env0(ENV_HOLD.id), env0(ENV_DECAY.id),
            env0(ENV_SUSTAIN.id), env0(ENV_RELEASE.id),
        )

    def process(self, state, x, params, ctx: BuildCtx):
        n = ctx.block_frames
        sr = ctx.sample_rate
        frames = self.buffer.frames
        ratio = self.buffer.sample_rate / sr
        buf = jnp.asarray(self.buffer.data)

        i = jnp.arange(n, dtype=jnp.float32)
        ii = jnp.arange(n, dtype=jnp.int32)
        pitch = jnp.exp2(params[TRANSPOSE.id] / 12.0 + params[FINETUNE.id] / 1200.0)  # [n]
        base_vol = params[VOLUME.id]
        base_pan = params[PANNING.id]
        env_p = self._envelope_params(params) if self.envelope is not None else None

        loop = self.buffer.loop_range
        fade_log1m = math.log1p(-(1.0 - math.exp(
            -1.0 / max(sr * self.options.fade_out_secs / math.log(100.0), 1e-9)
        )))

        def fold(pos):
            if loop is not None:
                return rs.loop_fold(pos, float(loop[0]), float(loop[1]),
                                    self.buffer.loop_mode), jnp.ones_like(pos, bool)
            return pos, pos < float(frames)

        def lane(note, vol, pan, age, rel, mask, pos):
            """Render one lane: positions [n] (source frames), age [n] runs,
            rel scalar (runs since note start), mask [n]."""
            p, live = fold(pos)
            audio = rs.hermite_read(buf, p)  # [ch_in, n]
            mono = jnp.mean(audio, axis=0) if self.buffer.channels > 1 else audio[0]
            if self.buffer.channels >= 2 and ctx.channels >= 2:
                sig = jnp.stack([audio[0], audio[1]])
            else:
                sig = jnp.stack([mono] * ctx.channels)
            m = (mask & live).astype(jnp.float32)
            if env_p is not None:
                env = ahdsr_ops.ahdsr_block(env_p, 1.0, age[0], rel + 0.0, n)
                # ahdsr_block takes scalar age0; ages here are contiguous
            else:
                held = age.astype(jnp.float32) < rel
                k = age.astype(jnp.float32) - rel + 1.0
                down = jnp.exp(fade_log1m * jnp.maximum(k, 0.0))
                env = jnp.where(held, 1.0, jnp.where(down < 1e-4, 0.0, down))
            eff_vol = base_vol * vol
            eff_pan = jnp.clip(base_pan + pan, -1.0, 1.0)
            l, r = panning_factors(eff_pan)
            g = env * eff_vol * m
            out = sig * g[None, :]
            if ctx.channels >= 2:
                out = out.at[0].multiply(l).at[1].multiply(r)
            return out

        def render_voice(base0, frac0, c_act, c_note, c_vol, c_pan, c_age0,
                         c_rel, t_time, t_note, t_vol, t_pan, t_rel):
            # lane A: continuing note (carried position)
            speed_a = pitch * jnp.exp2((c_note - 60.0) / 12.0) * np.float32(ratio)
            mask_a = (c_act > 0.5) & (ii < t_time)
            steps_a = jnp.where(mask_a, speed_a, 0.0)
            rel_a = jnp.cumsum(steps_a)
            pos_a = base0.astype(jnp.float32) + frac0 + jnp.concatenate(
                [jnp.zeros((1,), jnp.float32), rel_a[:-1]]
            )
            age_a = c_age0 + ii
            out = lane(c_note, c_vol, c_pan, age_a, c_rel, mask_a, pos_a)

            # lane B: (re)triggered note, position restarts at 0
            speed_b = pitch * jnp.exp2((t_note - 60.0) / 12.0) * np.float32(ratio)
            has_trig = t_time < n
            mask_b = (ii >= t_time) & has_trig & (t_vol > 0.0)
            steps_b = jnp.where(mask_b, speed_b, 0.0)
            rel_b = jnp.cumsum(steps_b)
            pos_b = jnp.concatenate([jnp.zeros((1,), jnp.float32), rel_b[:-1]])
            age_b = ii - t_time
            out = out + lane(t_note, t_vol, t_pan, age_b, t_rel, mask_b, pos_b)

            # end-of-block position state
            end_pos = jnp.where(mask_b[-1] | (has_trig & (t_vol > 0.0)),
                                rel_b[-1], pos_a[-1] + steps_a[-1])
            new_base = jnp.floor(end_pos)
            return out, new_base.astype(jnp.int32), end_pos - new_base

        outs, new_base, new_frac = jax.vmap(render_voice)(
            state["base"], state["frac"],
            params["_cont_active"], params["_cont_note"], params["_cont_vol"],
            params["_cont_pan"], params["_cont_age0"], params["_cont_rel"],
            params["_trig_time"], params["_trig_note"], params["_trig_vol"],
            params["_trig_pan"], params["_trig_rel"],
        )
        mix = jnp.sum(outs, axis=0)  # [ch, n]
        return {"base": new_base, "frac": new_frac}, mix
