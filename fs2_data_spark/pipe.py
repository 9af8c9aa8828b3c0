"""Pipe composition — the fs2-data ``Pipe[F, In, Out]`` shape on DataFrames.

In the reference every operator is a ``Pipe`` (a ``Stream => Stream``
function) composed with ``andThen`` / ``.through`` (e.g.
``csv/shared/src/main/scala/fs2/data/csv/package.scala:137``). The Spark
analogue is a ``DataFrame => DataFrame`` transformation; Catalyst plans the
composed chain lazily exactly as fs2 builds a lazy ``Pull``.

    normalize = Pipe(lambda df: df.filter("n_tok > 0"))
    featurize = Pipe(lambda df: with_lag_lead(df, ...))
    out = through(df, normalize, featurize)        # or (normalize | featurize)(df)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class Pipe:
    """A composable DataFrame transformation."""

    def __init__(self, fn: Callable[[DataFrame], DataFrame], name: str | None = None):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "pipe")

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.fn(df)

    def and_then(self, other: "Pipe | Callable[[DataFrame], DataFrame]") -> "Pipe":
        other_fn = other.fn if isinstance(other, Pipe) else other
        other_name = other.name if isinstance(other, Pipe) else getattr(other, "__name__", "pipe")
        return Pipe(lambda df: other_fn(self.fn(df)), name=f"{self.name}>>{other_name}")

    # `p1 | p2` mirrors fs2's `pipe1 andThen pipe2`
    __or__ = and_then

    def __repr__(self) -> str:  # pragma: no cover
        return f"Pipe({self.name})"


def through(df: DataFrame, *pipes: Pipe | Callable[[DataFrame], DataFrame]) -> DataFrame:
    """``stream.through(p1).through(p2)`` for DataFrames."""
    for p in pipes:
        df = p(df)
    return df
