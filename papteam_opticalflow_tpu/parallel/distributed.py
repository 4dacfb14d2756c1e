"""Multi-host orchestration.

The reference is single-process shared-memory only (SURVEY.md §2.7).  The
TPU-native scale-out story (SURVEY.md §5.8): one JAX process per host,
frame pairs sharded across hosts over DCN, chips within a host tiling
frames/rows over ICI.  This module provides the host-side pieces; the
device-side sharding lives in ``parallel/batch.py`` / ``parallel/tiled.py``.

Hardware note: this environment exposes a single chip, so ``initialize``
is exercised only in its single-process form; the work-sharding logic is
process-count-agnostic and unit-tested directly.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

T = TypeVar("T")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed (one call per host process).

    No-op when running single-process (all args None and no cluster env)."""
    import jax

    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard_work_items(
    items: Sequence[T],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[T]:
    """Deterministic strided split of a work list across host processes.

    Strided (not contiguous) so that heavier late items (e.g. higher-res
    collections appended last) spread evenly.
    """
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    return list(items[process_index::process_count])


def pad_batch_for_mesh(n_items: int, n_frame: int) -> int:
    """Items to add so a batch divides the ``frame`` mesh axis (pad pairs
    are duplicates whose results are dropped)."""
    return (-n_items) % n_frame
