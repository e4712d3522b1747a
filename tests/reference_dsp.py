"""Per-sample NumPy oracles mirroring the reference engine's DSP semantics.

These are deliberately naive sample-by-sample loops written from the
behavioural spec in SURVEY.md (reference file:line cited per function); the
JAX/TPU implementations are validated against them within tight tolerances.
"""

from __future__ import annotations

import math

import numpy as np

F32 = np.float32
EPS100 = 100.0 * np.finfo(np.float32).eps
MINUS_INF_DB = -200.0


def linear_to_db(v: float) -> float:
    # reference: src/utils.rs:25-36
    if v < 0.0 or math.isnan(v):
        return float("nan")
    if v == 1.0:
        return 0.0
    if v > 1e-12:
        return math.log(v) * (20.0 / math.log(10.0))
    return MINUS_INF_DB


def db_to_linear(v: float) -> float:
    # reference: src/utils.rs:40-51
    if math.isnan(v):
        return float("nan")
    if v == 0.0:
        return 1.0
    if v > MINUS_INF_DB:
        return math.exp(v * (math.log(10.0) / 20.0))
    return 0.0


def panning_factors(pan: float) -> tuple[float, float]:
    # reference: src/utils.rs:55-63
    n = (min(max(pan, -1.0), 1.0) + 1.0) / 2.0
    return math.sqrt(1.0 - n) * math.sqrt(2.0), math.sqrt(n) * math.sqrt(2.0)


# ---------------------------------------------------------------------------
# Smoothers (src/utils/smoothing.rs) — exact per-sample state machines.
# ---------------------------------------------------------------------------


class ExpSmoother:
    """src/utils/smoothing.rs:122-233 (f32 state machine)."""

    def __init__(self, value: float, sample_rate: int, inertia: float = 1.0 / 256.0):
        self.current = F32(value)
        self.target = F32(value)
        self.inertia = F32(inertia)
        self.comp = F32(44100.0 / sample_rate)

    def _inc(self) -> np.float32:
        return F32((self.target - self.current) * self.inertia * self.comp)

    def need_ramp(self) -> bool:
        return abs(self._inc()) > EPS100

    def set_target(self, t: float):
        self.target = F32(t)
        if not self.need_ramp():
            self.current = self.target

    def next(self) -> float:
        if self.need_ramp():
            self.current = F32(self.current + self._inc())
            return float(self.current)
        return float(self.target)

    def run(self, n: int) -> np.ndarray:
        return np.array([self.next() for _ in range(n)], np.float32)


class LinSmoother:
    """src/utils/smoothing.rs:238-420."""

    def __init__(self, value: float, sample_rate: int, step: float = 0.01):
        self.current = F32(value)
        self.target = F32(value)
        self.step = F32(step)
        self.comp = F32(44100.0 / sample_rate)
        self.current_step = F32(0.0)
        self.pending = 0

    def set_target(self, t: float):
        self.target = F32(t)
        if self.current == self.target:
            self.pending = 0
            return
        self.current_step = F32(
            -self.step * self.comp if self.current > self.target else self.step * self.comp
        )
        self.pending = max(int(round(float((self.target - self.current) / self.current_step))), 0)
        if self.pending == 0:
            self.current = self.target

    def next(self) -> float:
        if self.pending > 0:
            self.current = F32(self.current + self.current_step)
            self.pending -= 1
            if self.pending == 0:
                self.current = self.target
            return float(self.current)
        return float(self.target)

    def run(self, n: int) -> np.ndarray:
        return np.array([self.next() for _ in range(n)], np.float32)


class SpringSmoother:
    """src/utils/smoothing.rs:424-545."""

    def __init__(self, value: float, sample_rate: int, duration: int = 4410):
        self.current = F32(value)
        self.velocity = F32(0.0)
        self.target = F32(value)
        self.omega = F32(5.5 / duration)
        self.comp = F32(44100.0 / sample_rate)

    def need_ramp(self) -> bool:
        return abs(self.velocity) > EPS100 or abs(self.target - self.current) > EPS100

    def set_target(self, t: float):
        self.target = F32(t)

    def next(self) -> float:
        if self.need_ramp():
            w = F32(self.omega * self.comp)
            k = F32(w * w)
            d = F32(2.0 * w)
            self.velocity = F32(
                self.velocity + (self.target - self.current) * k - self.velocity * d
            )
            self.current = F32(self.current + self.velocity)
            return float(self.current)
        return float(self.target)

    def run(self, n: int) -> np.ndarray:
        return np.array([self.next() for _ in range(n)], np.float32)


def error_db(a: np.ndarray, b: np.ndarray, ref_peak: float | None = None) -> float:
    """Peak error in dB relative to the reference signal's peak."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    peak = ref_peak if ref_peak is not None else max(np.max(np.abs(b)), 1e-12)
    err = np.max(np.abs(a - b))
    if err == 0.0:
        return -np.inf
    return 20.0 * math.log10(err / peak)
