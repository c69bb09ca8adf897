"""Host-load capture for bench admissibility (VERDICT r4 next #1/#8).

Rounds 3-4 showed single-run walls on this shared-substrate VM carry
±10-20% noise and occasional co-tenant steal bursts that compress
4->16 scaling ratios. Every bench now records a /proc/stat delta over
its own measurement window so a draw is admissible or not by a STATED
rule, not post-hoc judgment:

    admissible iff steal_pct < 1.0 and the window's non-self idle
    headroom is consistent with the requested parallelism.

steal_pct is the fraction of all elapsed CPU jiffies the hypervisor
gave to co-tenants — the direct measure of the interference that
invalidated round-4's two 3M draws.
"""

from __future__ import annotations


def read_proc_stat() -> dict[str, int]:
    """First `cpu` line of /proc/stat as named jiffie counters."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    names = [
        "user", "nice", "system", "idle", "iowait",
        "irq", "softirq", "steal", "guest", "guest_nice",
    ]
    vals = [int(x) for x in parts[1:]]
    return dict(zip(names, vals))


def stat_delta(before: dict[str, int], after: dict[str, int]) -> dict:
    """Percent breakdown of CPU jiffies spent between two snapshots."""
    d = {k: after.get(k, 0) - before.get(k, 0) for k in before}
    total = sum(d.values()) or 1
    pct = lambda k: round(100.0 * d.get(k, 0) / total, 2)  # noqa: E731
    return {
        "steal_pct": pct("steal"),
        "idle_pct": pct("idle"),
        "iowait_pct": pct("iowait"),
        "busy_pct": round(
            100.0 - 100.0 * (d.get("idle", 0) + d.get("iowait", 0)) / total, 2
        ),
        "total_jiffies": total,
    }


def loadavg() -> list[float]:
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.readline().split()[:3]]
