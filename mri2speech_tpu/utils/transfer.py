"""Device->host transfer helpers for latency-sensitive fetch sites.

Through the axon tunnel every BLOCKING fetch (`np.asarray` on a jax array)
pays a full ~26 ms round trip, serially. When a step produces several
outputs, starting all transfers with `copy_to_host_async` before the first
blocking fetch lets them ride the link concurrently — measured on the live
chip: 16 small fetches drop from ~410 ms (serial) to 60-100 ms (prefetched).
See docs/BENCH_NOTES.md (round 5).
"""
from __future__ import annotations

__all__ = ["prefetch_to_host"]


def prefetch_to_host(*arrays) -> None:
    """Start device->host transfers for every jax array argument.

    Call immediately before a sequence of blocking fetches on the same
    arrays. Entries without `copy_to_host_async` (already-materialised numpy
    arrays, scalars) are skipped; a backend that rejects async copies falls
    back silently to the blocking path.
    """
    for a in arrays:
        copy = getattr(a, "copy_to_host_async", None)
        if copy is not None:
            try:
                copy()
            except Exception:
                return
