"""Process memory reporting (equivalent of /root/reference/report_memory.f90:
parse /proc/self/status VmPeak/VmSize/VmRSS/VmHWM each timestep), extended
with the device-side HBM usage JAX exposes."""

from __future__ import annotations

from typing import Dict


def report_memory() -> Dict[str, float]:
    """Host VM stats in MB (report_memory.f90:52) + device HBM in MB."""
    out: Dict[str, float] = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                key = line.split(":")[0]
                if key in ("VmPeak", "VmSize", "VmRSS", "VmHWM"):
                    out[key] = float(line.split()[1]) / 1024.0
    except OSError:
        pass
    try:
        import jax

        stats = jax.devices()[0].memory_stats()
        if stats:
            out["hbm_in_use"] = stats.get("bytes_in_use", 0) / 1e6
            out["hbm_peak"] = stats.get("peak_bytes_in_use", 0) / 1e6
    except Exception:
        pass
    return out


def format_memory_report() -> str:
    m = report_memory()
    return " ".join(f"{k}={v:.0f}MB" for k, v in m.items())
