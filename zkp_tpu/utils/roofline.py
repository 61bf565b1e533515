"""Automated per-kernel speed-of-light accounting (BASELINE north-star:
"report vs per-chip speed-of-light").

Analytic op/byte counts for the MSM/NTT hot phases + device peaks, so any
measured phase time converts to a fraction-of-roofline.  Peaks are for one
TPU v5e chip; the VPU u32 figure is the rate MEASURED on this hardware
(scripts/tpu_microbench: ~4e12 u32 mul+add lanes/s), HBM is the spec
number derated to the measured stream rate.
"""

from __future__ import annotations

from dataclasses import dataclass

# one v5e chip
VPU_U32_OPS = 4.0e12        # measured u32 mul+add throughput (round 2)
HBM_BYTES = 8.1e11          # ~810 GB/s spec; streams measure ~70-80%
GATHER_ROW_BYTES = 7.0e9 * 18  # measured: 128-B row gather ~= 7 GB/s/ms... see note


@dataclass
class Phase:
    name: str
    ops: float          # u32 ALU ops
    bytes_moved: float  # HBM bytes (read + write)

    def floor_ms(self) -> float:
        """max(compute, bandwidth) floor in ms."""
        return max(self.ops / VPU_U32_OPS, self.bytes_moved / HBM_BYTES) * 1e3

    def sol(self, measured_ms: float) -> float:
        f = self.floor_ms()
        return f / measured_ms if measured_ms > 0 else 0.0


def montgomery_mul_ops(L: int) -> float:
    """u32 ops per L-limb (16-bit) Montgomery multiply: ~2.5 L^2 mul+acc
    (product accumulation + reduction) + carry chain."""
    return 2.5 * L * L + 8 * L


def mixed_add_ops(L: int) -> float:
    """madd-2007-bl: 11 muls + ~7 add-class ops (complete-edge selects)."""
    return 11 * montgomery_mul_ops(L) + 14 * L


def msm_phases(n: int, c: int, B: int, L: int, R: int) -> list[Phase]:
    """Per-WINDOW phases of the kernelized Pippenger at n points."""
    G = n // B
    PCR = (R // L) * ((L + 1) // 2)
    row_b = 4 * (2 * PCR + 3)
    emit_b = 4 * ((3 * R + 1) // 2)
    return [
        Phase("digit_sort", 2.0 * n * 17, 2 * n * 8),     # bitonic-ish u32 sort
        Phase("gather", 0, n * 128 * 2),                  # 128-B rows r+w
        Phase("relayout", 0, 2 * n * row_b),
        Phase("run_scan", n * mixed_add_ops(L),
              n * row_b + n * emit_b),
        Phase("compact_sort", 2.0 * (n + G) * 17, 2 * (n + G) * 8),
        Phase("compact_gather", 0, 2 * (min(n, 1 << (c - 1)) + G) * emit_b),
    ]


def ntt_ops(n: int, L: int) -> float:
    """n/2 log n butterflies, each 1 mul + 2 add."""
    import math
    return (n / 2) * math.log2(n) * (montgomery_mul_ops(L) + 4 * L)


def report(measured: dict, n: int = 1 << 20, c: int = 16, B: int = 512,
           L: int = 24, R: int = 24, nwin: int = 16) -> str:
    """measured: {phase_name: ms_per_window} (+ optional 'total_ms',
    'ntt_ms'/'ntt_log_n'); returns a speed-of-light table."""
    lines = ["per-kernel speed-of-light (1 chip):",
             f"  {'phase':<16s} {'meas ms':>8s} {'floor ms':>9s} {'SOL':>6s}"]
    total_floor = 0.0
    for ph in msm_phases(n, c, B, L, R):
        total_floor += ph.floor_ms()
        if ph.name in measured:
            m = measured[ph.name]
            lines.append(f"  {ph.name:<16s} {m:>8.1f} {ph.floor_ms():>9.2f} "
                         f"{ph.sol(m)*100:>5.0f}%")
        else:
            lines.append(f"  {ph.name:<16s} {'-':>8s} {ph.floor_ms():>9.2f}")
    if "total_ms" in measured:
        mt = measured["total_ms"]
        ft = total_floor * nwin
        lines.append(f"  {'MSM total':<16s} {mt:>8.1f} {ft:>9.1f} "
                     f"{ft/mt*100:>5.0f}%  ({nwin} windows)")
    if "ntt_ms" in measured:
        ln = measured.get("ntt_log_n", 18)
        fl = ntt_ops(1 << ln, L) / VPU_U32_OPS * 1e3
        m = measured["ntt_ms"]
        lines.append(f"  {'NTT 2^%d' % ln:<16s} {m:>8.1f} {fl:>9.1f} "
                     f"{fl/m*100:>5.0f}%")
    lines.append("  (floors are ideal-streaming/ALU bounds; random row "
                 "gathers and sorts cannot reach their byte floors -- "
                 "treat SOL as a lower bound on attainable headroom)")
    return "\n".join(lines)


# round-4 measured phase nets (PERF_NOTES.md round-4 table)
ROUND4_MEASURED = {
    "digit_sort": 4.0, "gather": 17.0, "relayout": 4.0, "run_scan": 19.0,
    "compact_sort": 6.0, "compact_gather": 4.0,
    "total_ms": 836.7, "ntt_ms": 34.7, "ntt_log_n": 18,
}


if __name__ == "__main__":
    print(report(ROUND4_MEASURED))
