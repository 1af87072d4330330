"""The synchronous GAS engine as a driver-side superstep loop.

Reproduces the semantics of the reference's synchronous engine
(/root/reference/src/graphlab/engine/synchronous_engine.hpp:1302-1421):

  1. exchange_messages + receive_messages  -> the gather join+agg shuffle
  2. execute_gathers (per-replica partial, += merged at master)
                                           -> Spark partial+final hash agg
  3. execute_applys (master mutates, broadcast to mirrors)
                                           -> vertices join messages + apply expr
  4. execute_scatters (signal next frontier)
                                           -> delta/changed-based active set
  5. aggregator tick + snapshot_interval   -> per-superstep metrics + checkpoint

Termination: active set empty (TASK_DEPLETION,
synchronous_engine.hpp:1359-1368), max_iterations, or timeout
(engine options at synchronous_engine.hpp:986-1059).

Spark-specific discipline: iterative DataFrame loops grow lineage
without bound; every superstep the new state is persisted and the old
unpersisted, and every ``checkpoint_interval`` supersteps the state is
committed to the checkpoint store and re-read (plan truncation +
durable resume point — strictly stronger than the reference's
save_binary snapshot, which requires the same machine count to reload,
distributed_graph.hpp:1720-1833; ours resumes at any parallelism).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

from .checkpoint import CheckpointStore
from .graph import Graph


@dataclass
class SuperstepMetrics:
    superstep: int
    active: int
    metric: float
    wall_sec: float
    extras: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "superstep": self.superstep,
                "active": self.active,
                "metric": self.metric,
                "wall_sec": round(self.wall_sec, 4),
                **self.extras,
            }
        )


@dataclass
class GASResult:
    state: DataFrame
    supersteps: int
    converged: bool
    termination: str  # TASK_DEPLETION | MAX_ITERATIONS | TIMEOUT
    metrics: list[SuperstepMetrics]


def run_gas(
    graph: Graph,
    init_state: DataFrame,
    step_fn: Callable[[Graph, DataFrame, int], tuple[DataFrame, DataFrame | None]],
    *,
    convergence_fn: Callable[[DataFrame, DataFrame], tuple[int, float]] | None = None,
    tol: float = 0.0,
    max_iterations: int = 100,
    timeout_sec: float | None = None,
    checkpoint: CheckpointStore | None = None,
    checkpoint_interval: int = 1,
    resume: bool = False,
    verbose: bool = False,
) -> GASResult:
    """Run the superstep loop to TASK_DEPLETION / max_iterations.

    ``step_fn(graph, state, i) -> (new_state, active_or_None)``
        one full gather-apply-scatter superstep expressed in DataFrame
        ops; ``active`` is an optional slim frontier DataFrame whose
        emptiness terminates the loop (signal semantics).
    ``convergence_fn(old_state, new_state) -> (active_count, metric)``
        used when step_fn returns no frontier: delta-based convergence
        (scatter's signal-if-|delta|>tol, e.g. pagerank.cpp:124-135).
        Terminates when active_count == 0 or metric <= tol.
    """
    t_start = time.time()
    state = init_state.persist(StorageLevel.MEMORY_AND_DISK)
    state.count()  # materialize
    start_step = 0

    if resume and checkpoint is not None:
        resumed = checkpoint.latest()
        if resumed is not None:
            start_step, state = resumed
            state = state.persist(StorageLevel.MEMORY_AND_DISK)
            if verbose:
                print(f"[gas] resumed at superstep {start_step}")

    metrics: list[SuperstepMetrics] = []
    converged = False
    termination = "MAX_ITERATIONS"
    i = start_step
    while i < max_iterations:
        t0 = time.time()
        new_state, active = step_fn(graph, state, i)
        new_state = new_state.persist(StorageLevel.MEMORY_AND_DISK)

        if active is not None:
            n_active = active.count()
            metric = float(n_active)
        elif convergence_fn is not None:
            n_active, metric = convergence_fn(state, new_state)
        else:
            n_active, metric = new_state.count(), float("inf")

        i += 1
        # snapshot_interval analog (synchronous_engine.hpp:1418-1420):
        # durable state + per-partition lineage + metrics, then re-read
        # to truncate the logical plan.
        if checkpoint is not None and (
            i % checkpoint_interval == 0 or n_active == 0 or metric <= tol
        ):
            m = SuperstepMetrics(i, n_active, metric, time.time() - t0)
            new_state = checkpoint.commit(i, new_state, m)
            new_state = new_state.persist(StorageLevel.MEMORY_AND_DISK)
        else:
            # plan truncation without durability
            new_state = new_state.localCheckpoint(eager=True)

        state.unpersist()
        state = new_state
        m = SuperstepMetrics(i, n_active, metric, time.time() - t0)
        metrics.append(m)
        if verbose:
            print(f"[gas] {m.to_json()}")

        if n_active == 0 or (tol > 0 and metric <= tol):
            converged = True
            termination = "TASK_DEPLETION"
            break
        if timeout_sec is not None and time.time() - t_start > timeout_sec:
            termination = "TIMEOUT"
            break

    return GASResult(
        state=state,
        supersteps=i,
        converged=converged,
        termination=termination,
        metrics=metrics,
    )
