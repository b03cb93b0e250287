"""Fold / FoldOption — the per-key stateful fold programming model.

Reference semantics (cited into /root/reference/):
- ``Fold[F, S, A]: (S, A) => F[S]`` — core/src/main/scala/com/evolutiongaming/kafka/flow/Fold.scala:14
- ``FoldOption[F, S, A]: (Option[S], A) => F[Option[S]]`` — core/.../FoldOption.scala:10
  A ``None`` result deletes the key's state (and its persisted copy) —
  core/.../FoldToState.scala:62-89.
- Combinators: ``contramap`` (Fold.scala:24-36), ``transformState`` (Fold.scala:47-67),
  ``flatMap``/``productR`` (Fold.scala:78-91), ``filter`` (Fold.scala:94-106),
  ``contraCollect`` (Fold.scala:109-113), ``handleErrorWith`` (Fold.scala:119-122).

Python is not effect-typed, so the ``*M`` effectful variants collapse into the
plain ones (any Python callable may already perform effects).  State ``S`` is an
arbitrary Python value; at the execution boundary (operators.keyed /
streaming.flow) it is encoded into the user-declared Spark ``StructType`` —
strictly schema-ful, replacing the reference's opaque ``ToBytes``/``FromBytes``
(persistence-cassandra/.../CassandraPersistence.scala:31).

Records arrive as plain ``dict``s (one per input row, ordered by the offset
column within the key) — this is deliberately the *semantic* API.  Hot
aggregation paths should use built-in Spark exprs / Window functions instead;
the fold API exists for arbitrary per-key state machines, which is the
reference's core competency and inherently the Python path.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

State = Any
Record = dict[str, Any]


@dataclass(frozen=True)
class FoldOption:
    """``(state | None, record) -> state | None``; ``None`` result = delete key."""

    fn: Callable[[State | None, Record], State | None]

    def __call__(self, state: State | None, record: Record) -> State | None:
        return self.fn(state, record)

    # --- input projection (Fold.scala:24-36 contramap) ---
    def contramap(self, g: Callable[[Record], Record]) -> "FoldOption":
        return FoldOption(lambda s, a: self.fn(s, g(a)))

    # --- partial-function filter+map of input (Fold.scala:109-113 contraCollect) ---
    def contra_collect(self, pf: Callable[[Record], Record | None]) -> "FoldOption":
        def run(s: State | None, a: Record) -> State | None:
            b = pf(a)
            return s if b is None else self.fn(s, b)

        return FoldOption(run)

    # --- stateful filter: predicate over (state, input) (Fold.scala:94-106) ---
    def filter(self, pred: Callable[[State | None, Record], bool]) -> "FoldOption":
        return FoldOption(lambda s, a: self.fn(s, a) if pred(s, a) else s)

    # --- state projection (Fold.scala:47-67 transformState) ---
    def transform_state(
        self, wrap: Callable[[State], State], unwrap: Callable[[State], State]
    ) -> "FoldOption":
        def run(s: State | None, a: Record) -> State | None:
            inner = None if s is None else unwrap(s)
            out = self.fn(inner, a)
            return None if out is None else wrap(out)

        return FoldOption(run)

    # --- sequencing: run another fold on the same input (Fold.scala:78-91) ---
    def and_then(self, other: "FoldOption") -> "FoldOption":
        """``productR``: fold input through self, then through ``other``."""
        return FoldOption(lambda s, a: other.fn(self.fn(s, a), a))

    def flat_map(self, f: Callable[[State | None], "FoldOption"]) -> "FoldOption":
        def run(s: State | None, a: Record) -> State | None:
            s1 = self.fn(s, a)
            return f(s1).fn(s1, a)

        return FoldOption(run)

    # --- error handling (Fold.scala:119-122 handleErrorWith) ---
    def handle_error_with(
        self, h: Callable[[State | None, Record, Exception], State | None]
    ) -> "FoldOption":
        def run(s: State | None, a: Record) -> State | None:
            try:
                return self.fn(s, a)
            except Exception as e:  # noqa: BLE001 — contract: recover any fold error
                return h(s, a, e)

        return FoldOption(run)


def fold_option(fn: Callable[[State | None, Record], State | None]) -> FoldOption:
    return FoldOption(fn)


@dataclass(frozen=True)
class FoldExtras:
    """Framework extras an enhanced fold may use (EnhancedFold #10,
    core/.../EnhancedFold.scala:20-48 + KeyFlowExtras.scala:16-35).

    - ``key``: the entity's key columns.
    - ``request_additional_persist``: in the reference, asks persistence to
      flush mid-batch (AdditionalStatePersist, #44).  Under Spark epochs the
      state write is durable at batch commit regardless, so this is recorded
      for observability but requires no action — the documented subsumption
      (SURVEY.md §2.1 #44).
    """

    key: dict[str, Any]

    def request_additional_persist(self) -> None:
        return None


def enhanced_fold(
    fn: Callable[[FoldExtras, State | None, Record], State | None],
    key_cols: tuple[str, ...] = ("key",),
) -> FoldOption:
    """Lift an EnhancedFold (extras-aware) into a plain FoldOption.

    Extras are rebuilt per record from its key columns — the record dict also
    carries offset/timestamp columns, so everything KeyFlowExtras exposes is
    in scope.
    """

    def run(s: State | None, a: Record) -> State | None:
        extras = FoldExtras(key={k: a.get(k) for k in key_cols})
        return fn(extras, s, a)

    return FoldOption(run)


def of_fold(initial: Callable[[], State], fn: Callable[[State, Record], State]) -> FoldOption:
    """Lift a total ``Fold`` (never-None state) into ``FoldOption``.

    Mirrors ``Fold.toFoldOption`` usage: absent state is created via ``initial``.
    """
    return FoldOption(lambda s, a: fn(initial() if s is None else s, a))
