"""Process-level JAX configuration shared by all entry points."""
from __future__ import annotations

import os


def maybe_initialize_distributed(coordinator: str | None = None,
                                 num_processes: int | None = None,
                                 process_id: int | None = None) -> bool:
    """Bring up the multi-host runtime (the reference's
    torch.distributed.launch + NCCL init-at-import,
    main_task_align.py:21 / main_seg_zeroshot.py:307).

    Explicit args (CLI flags) win; otherwise the SEGCLIP_DIST_COORDINATOR /
    SEGCLIP_DIST_NPROCS / SEGCLIP_DIST_PROCID env triple is used; otherwise
    SEGCLIP_DIST=1 requests JAX's automatic cluster detection (TPU pod
    metadata / SLURM). Single-host runs (nothing set) skip initialization —
    `jax.process_count()` stays 1. Returns True if initialize() was called.

    On CPU (the 2-process simulation in tests/test_multihost.py)
    cross-process collectives need the gloo backend — selected here before
    first jax use.
    """
    import jax
    coordinator = coordinator or os.environ.get("SEGCLIP_DIST_COORDINATOR")
    if num_processes is None and "SEGCLIP_DIST_NPROCS" in os.environ:
        num_processes = int(os.environ["SEGCLIP_DIST_NPROCS"])
    if process_id is None and "SEGCLIP_DIST_PROCID" in os.environ:
        process_id = int(os.environ["SEGCLIP_DIST_PROCID"])

    # Coordination-service deadlines, all overridable by env (seconds):
    #   SEGCLIP_DIST_INIT_TIMEOUT       all processes must connect (300)
    #   SEGCLIP_DIST_HEARTBEAT_TIMEOUT  missed-heartbeat kill — raise it on
    #                                   hosts where a rank can stall whole-
    #                                   process (GC pause, swap) (100)
    #   SEGCLIP_DIST_SHUTDOWN_TIMEOUT   exit barrier (300)
    # These cover the coordinator protocol only; COLLECTIVE skew (one rank
    # reaching a barrier late, e.g. non-zero hosts waiting at the eval
    # broadcast while host 0 evals, train/loop.py) is handled by
    # parallel/mesh.warmup_collectives — the communicator rendezvous has a
    # hard 30 s deadline compiled into gloo, but an ESTABLISHED
    # communicator waits without one (measured; docs/PERF.md "Multi-host
    # timeouts").
    timeouts = dict(
        initialization_timeout=int(
            os.environ.get("SEGCLIP_DIST_INIT_TIMEOUT", 300)),
        heartbeat_timeout_seconds=int(
            os.environ.get("SEGCLIP_DIST_HEARTBEAT_TIMEOUT", 100)),
        shutdown_timeout_seconds=int(
            os.environ.get("SEGCLIP_DIST_SHUTDOWN_TIMEOUT", 300)))
    if coordinator:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass                      # non-CPU backends don't need it
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id, **timeouts)
        return True
    if os.environ.get("SEGCLIP_DIST") == "1":
        jax.distributed.initialize(**timeouts)  # auto-detect (TPU pod/SLURM)
        return True
    return False


def setup_jax(cache_dir: str | None = None,
              coordinator: str | None = None,
              num_processes: int | None = None,
              process_id: int | None = None) -> None:
    """Multi-host init (when configured) + the persistent compilation cache
    (first compiles of the big train/eval graphs take minutes on tunneled
    backends; the cache makes every later process start warm)."""
    import jax
    platform = os.environ.get("SEGCLIP_PLATFORM")
    if platform:
        # this image's sitecustomize force-registers the tunneled TPU and
        # rewrites JAX_PLATFORMS, so a config update before first jax use
        # is the only reliable way to force a backend (CPU for tests /
        # multi-process simulation, debugging without the chip). After a
        # backend is initialized the update is a silent no-op — verified
        # below, because silently grabbing the TPU when the caller asked
        # for CPU is the worst failure mode.
        jax.config.update("jax_platforms", platform)
    maybe_initialize_distributed(coordinator, num_processes, process_id)
    if platform and jax.default_backend() != platform:
        raise RuntimeError(
            f"SEGCLIP_PLATFORM={platform!r} had no effect — the "
            f"{jax.default_backend()!r} backend was already initialized "
            f"before setup_jax() ran (set the env before ANY jax use)")
    cache = cache_dir or os.environ.get("SEGCLIP_JAX_CACHE",
                                        "/tmp/segclip_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
