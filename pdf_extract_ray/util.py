"""Small shared helpers for the Ray Data stages."""
from __future__ import annotations


def default_concurrency(lo: int = 1):
    """Actor-pool sizing: autoscale between `lo` and the cluster CPU count.
    Ray requires an explicit `concurrency` for callable-class UDFs."""
    import ray
    try:
        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    return (lo, max(lo, n))


_UDF_SINGLETONS = {}


def task_udf(cls, **kwargs):
    """Module-level singleton UDF instance per (class, kwargs): with
    task-compute map_batches, Ray reuses warm worker processes, so the
    instance's setup cost (params, caches) is paid once per worker —
    the same effect as an actor pool without per-execution spin-up."""
    key = (cls.__module__, cls.__qualname__, tuple(sorted(kwargs.items())))
    inst = _UDF_SINGLETONS.get(key)
    if inst is None:
        inst = _UDF_SINGLETONS[key] = cls(**kwargs)
    return inst
