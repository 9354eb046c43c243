"""Per-kernel roofline accounting (SURVEY.md §5: the TPU equivalent of the
reference's ad-hoc wall-clock meters is per-kernel roofline numbers).

``roofline(fn, *args)`` compiles a jittable function and reports the XLA cost
model's FLOPs and bytes accessed, the arithmetic intensity, and — given the
chip's peak numbers — which roof binds and the speed-of-light time.  Pair
with a measured time (chained-loop + readback fence, see docs/performance.md)
to get achieved fraction of peak.

Caveat from round-1 measurements: the XLA cost model can grossly overestimate
gather traffic (it charged ~800 B per gathered element for the flat-gather
resampler); treat ``bytes`` as an upper bound and trust measured times for
rankings.
"""

from __future__ import annotations

import dataclasses

__all__ = ["RooflineReport", "roofline", "V5E_PEAKS"]

# TPU v5e single-chip peaks (public figures): bf16 MXU TFLOP/s, HBM GB/s.
V5E_PEAKS = {"flops_per_s": 197e12, "bytes_per_s": 819e9}


@dataclasses.dataclass
class RooflineReport:
    flops: float
    bytes_accessed: float
    transcendentals: float

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / self.bytes_accessed if self.bytes_accessed else float("inf")

    def bound(self, peaks: dict = V5E_PEAKS) -> str:
        ridge = peaks["flops_per_s"] / peaks["bytes_per_s"]
        return "compute" if self.arithmetic_intensity >= ridge else "memory"

    def speed_of_light_s(self, peaks: dict = V5E_PEAKS) -> float:
        """Lower-bound execution time from whichever roof binds."""
        return max(
            self.flops / peaks["flops_per_s"],
            self.bytes_accessed / peaks["bytes_per_s"],
        )

    def achieved_fraction(self, measured_s: float, peaks: dict = V5E_PEAKS) -> float:
        sol = self.speed_of_light_s(peaks)
        return sol / measured_s if measured_s > 0 else 0.0

    def summary(self, measured_s: float | None = None) -> str:
        parts = [
            f"{self.flops/1e9:.2f} GFLOP",
            f"{self.bytes_accessed/1e9:.3f} GB accessed",
            f"AI {self.arithmetic_intensity:.2f} flop/B",
            f"{self.bound()}-bound",
            f"speed-of-light {self.speed_of_light_s()*1e3:.3f} ms",
        ]
        if measured_s is not None:
            parts.append(
                f"measured {measured_s*1e3:.3f} ms "
                f"({100*self.achieved_fraction(measured_s):.1f}% of roof)"
            )
        return " | ".join(parts)


def roofline(fn, *args, **kwargs) -> RooflineReport:
    """Compile ``fn(*args)`` (jit-wrapping if needed) and report its cost
    analysis."""
    import jax

    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    cost = cost or {}
    return RooflineReport(
        flops=float(cost.get("flops", 0.0)),
        bytes_accessed=float(cost.get("bytes accessed", 0.0)),
        transcendentals=float(cost.get("transcendentals", 0.0)),
    )
