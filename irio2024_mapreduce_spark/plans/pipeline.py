"""Pluggable named-step pipeline — reference parity for R11/R12.

The reference lets users replace (a) the per-step worker function —
Python `exec`'d from a GCS blob, signature
``f(input_file, output_file, range_start, range_end)``
(``mapreduce/worker/utils.py:17-26``, ``worker_service.py:17-23``) —
and (b) the step graph itself: a dict ``ALGORITHM_STEPS[name] =
{"callback": ..., "next": ...}`` walked from ``INIT_STEP``
(``mapreduce/coordinator/utils.py:80-100``,
``coordinator/algorithm.py:142-166``).

Spark-first re-expression:

* a *step* is a named ``DataFrame -> DataFrame`` transform;
* the *graph* is the same ``{name: (callback, next)}`` linked walk;
* a *partition-level user function* (the reference's worker step,
  which sees a byte range of input) becomes an Arrow-batched
  ``mapInPandas`` stage via :func:`pandas_partition_step`.

Crucial difference from the reference: steps return **unexecuted**
DataFrames, so Catalyst optimizes across step boundaries — the
reference materializes every step to GCS
(``coordinator/algorithm.py:123-134``), we materialize nothing until
the final action. No exec-from-bucket either: closures ship through
Spark's serializer (the reference's pattern is RCE-by-design,
SURVEY.md §7 non-goals).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame

StepFn = Callable[[DataFrame], DataFrame]


@dataclass
class Pipeline:
    """Linked named-step graph, walked from ``init_step``.

    >>> p = Pipeline()
    >>> p.add_step("map", tokenize_step, next_step="reduce")
    >>> p.add_step("reduce", count_step)
    >>> result_df = p.run(input_df)          # still lazy
    """

    steps: dict[str, tuple[StepFn, str | None]] = field(default_factory=dict)
    init_step: str | None = None

    def add_step(
        self, name: str, fn: StepFn, next_step: str | None = None
    ) -> "Pipeline":
        if name in self.steps:
            raise ValueError(f"duplicate step {name!r}")
        if self.init_step is None:
            self.init_step = name
        self.steps[name] = (fn, next_step)
        return self

    def run(self, df: DataFrame) -> DataFrame:
        """Walk the step graph; returns the final (lazy) DataFrame."""
        if self.init_step is None:
            raise ValueError("pipeline has no steps")
        name: str | None = self.init_step
        seen: set[str] = set()
        while name is not None:
            if name in seen:
                raise ValueError(f"step cycle at {name!r}")
            seen.add(name)
            if name not in self.steps:
                raise KeyError(f"unknown step {name!r}")
            fn, name = self.steps[name]
            df = fn(df)
        return df


def pandas_partition_step(
    fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str
) -> StepFn:
    """Wrap a pandas-batch function as a pipeline step (reference R11).

    The reference's custom worker function sees one byte-range of one
    blob at a time; here ``fn`` sees one Arrow record batch at a time
    via ``mapInPandas`` — same partition-at-a-time contract, but
    columnar, vectorized, and parallelized by Spark's scheduler
    instead of the coordinator poll loop.
    """

    def step(df: DataFrame) -> DataFrame:
        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                out = fn(batch)
                if len(out):
                    yield out

        return df.mapInPandas(gen, schema=schema)

    return step
