"""ObjectFrame: distributed collection of objects over a Spark DataFrame.

Capability parity with the reference ``DaskObjects``
(``src/dask_obj/core.py:34-108``) plus the dask.bag surface it re-exposes
through ``use_bag_attrs``/``items`` (SURVEY.md Tier D), re-expressed
Catalyst-first:

- Three storage modes, chosen at ingest and tracked explicitly:
  *struct* (multi-column DataFrame; element = Row), *scalar* (single
  ``value`` column of a native Spark type), *pickled* (single
  ``value BINARY`` column holding pickled arbitrary objects — the
  "any Python object" contract of the reference, kept columnar via
  Arrow-batched ``mapInPandas``).
- Broadcast semantics: attribute access / item access / ``call`` /
  operators map element-wise (reference ``core.py:62-76``,
  ``core.py:180-220``) — compiled to Column expressions whenever the
  element type is native, so they run JVM-side under codegen; the pickled
  mode replays per element in Arrow batches (the documented slow path).
- Deliberate upgrades (SURVEY.md Appendix A — reference defects NOT
  replicated): unknown attributes raise eagerly instead of becoming
  silent lazy failures; default partitioning is Spark's, not
  one-element-per-partition; operators are supported uniformly (the
  reference's ``DaskObjects`` lacks dunders).

Scale notes (100 TB design intent): every native-mode operation is a
DataFrame transformation — Catalyst keeps pushdown/pruning, aggregation
is partial+final, ``counts``/``frequencies`` are two-phase hash
aggregates, ``reduction`` collects exactly one small partial per
partition. Only ``compute()`` (an explicit action, like the reference's)
materializes to the driver.
"""

from __future__ import annotations

import functools
import pickle
from collections import Counter

from pyspark import cloudpickle as _cloudpickle

# serialize with cloudpickle (handles __main__-defined classes/lambdas by
# value — the reference's "arbitrary object" contract requires it);
# deserialize with plain pickle.loads (cloudpickle emits standard opcodes)
_dumps = _cloudpickle.dumps
from collections.abc import Iterable, Sequence
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dask_obj_spark.expr import Expr, compile_expr
from dask_obj_spark.functions.dispatch import dispatch_method

VALUE = "value"
# companion position column on zip-derived frames: the positional contract
# is settled driver-side at materialize (compute/take), never by a
# distributed global sort
ORD = "__ord__"


def _spark_type_for(value: Any) -> T.DataType | None:
    """Best-effort Spark type for a sampled Python value; None = not native."""
    if isinstance(value, bool):
        return T.BooleanType()
    if isinstance(value, int):
        return T.LongType()
    if isinstance(value, float):
        return T.DoubleType()
    if isinstance(value, str):
        return T.StringType()
    if isinstance(value, (bytes, bytearray)):
        return T.BinaryType()
    import datetime

    if isinstance(value, datetime.datetime):
        return T.TimestampType()
    if isinstance(value, datetime.date):
        return T.DateType()
    if isinstance(value, (list, tuple)) and value and not isinstance(value, dict):
        inner = _spark_type_for(value[0])
        if inner is not None and all(_spark_type_for(v).__class__ is inner.__class__ for v in value):
            return T.ArrayType(inner)
        return None
    return None


def _contiguous_repartition(df: "DataFrame", npartitions: int) -> "DataFrame":
    """Order-preserving repartition: contiguous ordered slices.

    ``monotonically_increasing_id`` is (partition, position)-ordered and
    local collections are parallelized as contiguous chunks, so the id
    order IS the original sequence order; range-partitioning on it gives
    dask-``from_sequence``-shaped partitions."""
    ord_col = "__of_ord__"
    tagged = df.withColumn(ord_col, F.monotonically_increasing_id())
    return (
        tagged.repartitionByRange(npartitions, ord_col)
        .sortWithinPartitions(ord_col)
        .drop(ord_col)
    )


class _EmptySentinel:
    """Pickle-safe 'no value' marker (checked with isinstance, not identity —
    identity does not survive the driver→executor pickle boundary).  Used as
    the no-``initial`` default so ``None`` stays a legitimate initial value."""


_EMPTY = _EmptySentinel()


def _fold_list(binop: Callable, items: list, initial: Any = _EMPTY) -> Any:
    if not items:
        return initial
    if not isinstance(initial, _EmptySentinel):
        return functools.reduce(binop, items, initial)
    return functools.reduce(binop, items)


class ObjectFrame:
    """Distributed object collection (the ``DaskObjects`` equivalent).

    Construct from a Python sequence, an existing ``DataFrame``, or via
    :meth:`read_parquet`.  ``use_df_attrs=True`` reproduces the
    reference's ``use_bag_attrs`` passthrough (``core.py:45-47,62-66``):
    unknown attributes resolve against the wrapped DataFrame first,
    exposing the full pyspark surface (Tier D) before broadcasting.
    """

    def __init__(
        self,
        items: Any,
        spark: SparkSession | None = None,
        *,
        npartitions: int | None = None,
        use_df_attrs: bool = False,
        config: dict | None = None,
        _pickled: bool = False,
    ):
        self._config = dict(config or {})
        self._use_df_attrs = use_df_attrs
        from_sequence = False
        if isinstance(items, ObjectFrame):
            df, _pickled = items._df, items._pickled
        elif isinstance(items, DataFrame):
            df = items
        else:
            if spark is None:
                raise ValueError("spark session required to build from a sequence")
            df, _pickled = self._ingest(spark, items)
            from_sequence = True
        if npartitions is not None:
            # sequences carry a positional contract (accumulate scans, zip,
            # cross-collection dunders): round-robin repartition() scrambles
            # element order across partitions, so slice contiguously like
            # dask's from_sequence; plain DataFrames have no such contract.
            df = (
                _contiguous_repartition(df, npartitions)
                if from_sequence
                else df.repartition(npartitions)
            )
        self._df = df
        self._pickled = _pickled

    # -- construction ---------------------------------------------------------

    @staticmethod
    def _ingest(spark: SparkSession, items: Sequence[Any] | Iterable[Any]) -> tuple[DataFrame, bool]:
        items = list(items)
        if not items:
            return spark.createDataFrame([], schema=T.StructType([T.StructField(VALUE, T.NullType())])), False
        first = items[0]
        if isinstance(first, dict):
            try:
                return spark.createDataFrame(items), False
            except Exception:
                pass
        elif isinstance(first, tuple) and not isinstance(first, bool):
            try:
                return spark.createDataFrame(items), False
            except Exception:
                pass
        else:
            typ = _spark_type_for(first)

            def _same_type(x):
                t = _spark_type_for(x)
                return t is not None and type(t) is type(typ)

            # all items must map to the same Spark type — the Arrow ingest
            # path silently coerces mismatches to string otherwise
            if typ is not None and all(_same_type(x) for x in items):
                try:
                    schema = T.StructType([T.StructField(VALUE, typ)])
                    return spark.createDataFrame([(x,) for x in items], schema=schema), False
                except Exception:
                    pass
        # opaque / heterogeneous → pickled binary column (reference's
        # "any object" contract; SURVEY.md §1.2)
        pdf = [(_dumps(x),) for x in items]
        schema = T.StructType([T.StructField(VALUE, T.BinaryType())])
        return spark.createDataFrame(pdf, schema=schema), True

    @classmethod
    def from_df(cls, df: DataFrame, **kw) -> "ObjectFrame":
        return cls(df, **kw)

    @classmethod
    def read_parquet(cls, spark: SparkSession, path: str, **kw) -> "ObjectFrame":
        return cls(spark.read.parquet(path), **kw)

    def _make(self, df: DataFrame, pickled: bool | None = None) -> "ObjectFrame":
        # operator closure: every derived frame carries config/flags
        # (reference _make_new, core.py:59-60)
        new = ObjectFrame.__new__(ObjectFrame)
        new._config = dict(self._config)
        new._use_df_attrs = self._use_df_attrs
        new._df = df
        new._pickled = self._pickled if pickled is None else pickled
        return new

    # -- introspection --------------------------------------------------------

    @property
    def df(self) -> DataFrame:
        """The wrapped DataFrame (the reference's public ``items`` field)."""
        return self._df

    @property
    def is_scalar(self) -> bool:
        return len(self._df.columns) == 1 and self._df.columns[0] == VALUE

    @property
    def is_pickled(self) -> bool:
        return self._pickled

    def __repr__(self) -> str:
        mode = "pickled" if self._pickled else ("scalar" if self.is_scalar else "struct")
        return f"<ObjectFrame mode={mode} schema={self._df.schema.simpleString()}>"

    __str__ = __repr__

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    # -- element plumbing -----------------------------------------------------

    def _element_rdd(self):
        if self._pickled:
            return self._df.rdd.map(lambda r: pickle.loads(bytes(r[0])))
        if self.is_scalar:
            return self._df.rdd.map(lambda r: r[0])
        return self._df.rdd

    def _head_element(self) -> Any:
        rows = self._df.take(1)
        if not rows:
            raise ValueError("empty collection")
        r = rows[0]
        if self._pickled:
            return pickle.loads(bytes(r[0]))
        return r[0] if self.is_scalar else r

    def _map_objects(self, fn: Callable[[Any], Any]) -> "ObjectFrame":
        """Element→element map in pickled mode (Arrow-batched).  A zip
        position column rides along so downstream materialize stays
        order-correct."""
        import pandas as pd

        has_ord = ORD in self._df.columns

        def gen(batches):
            for pdf in batches:
                out = [_dumps(fn(pickle.loads(bytes(b)))) for b in pdf[VALUE]]
                cols = {VALUE: out}
                if has_ord:
                    cols[ORD] = pdf[ORD]
                yield pd.DataFrame(cols)

        schema = f"{VALUE} binary" + (f", {ORD} long" if has_ord else "")
        return self._make(self._df.mapInPandas(gen, schema), pickled=True)

    def _to_pickled(self) -> "ObjectFrame":
        if self._pickled:
            return self
        import pandas as pd

        scalar = self.is_scalar
        cols = self._df.columns

        def gen(batches):
            for pdf in batches:
                if scalar:
                    out = [_dumps(v) for v in pdf[VALUE]]
                else:
                    out = [_dumps(dict(zip(cols, t))) for t in pdf.itertuples(index=False, name=None)]
                yield pd.DataFrame({VALUE: out})

        return self._make(self._df.mapInPandas(gen, f"{VALUE} binary"), pickled=True)

    def _python_elementwise(self, fn: Callable[[Any], Any]) -> "ObjectFrame":
        """Apply an arbitrary Python function per element.

        Samples one element to infer a native result type (schema fixed at
        ingest — SURVEY.md §1.2); falls back to pickled mode when the
        result is not Spark-native.
        """
        if self._pickled:
            return self._map_objects(fn)
        sample = self._head_element()
        try:
            probe = fn(sample)
            out_type = _spark_type_for(probe)
        except Exception:
            out_type = None
        if out_type is None:
            return self._to_pickled()._map_objects(fn)
        import pandas as pd

        scalar = self.is_scalar
        cols = self._df.columns
        schema = T.StructType([T.StructField(VALUE, out_type)])

        def gen(batches):
            for pdf in batches:
                if scalar:
                    vals = [fn(v) for v in pdf[VALUE]]
                else:
                    from pyspark.sql import Row

                    vals = [fn(Row(**dict(zip(cols, t)))) for t in pdf.itertuples(index=False, name=None)]
                yield pd.DataFrame({VALUE: vals})

        return self._make(self._df.mapInPandas(gen, schema), pickled=False)

    def _value_column(self) -> Column:
        if not self.is_scalar:
            raise TypeError("operation requires a single-value collection; project a column first")
        return F.col(VALUE)

    def _select_value(self, col: Column) -> "ObjectFrame":
        return self._make(self._df.select(col.alias(VALUE)), pickled=False)

    # -- broadcast projections (A2/A3) ---------------------------------------

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        # use_bag_attrs passthrough (reference core.py:62-66): DataFrame wins
        if object.__getattribute__(self, "_use_df_attrs") and hasattr(self._df, name):
            return getattr(self._df, name)
        if self._pickled:
            import operator as op

            return self._map_objects(op.attrgetter(name))
        if name in self._df.columns and not self.is_scalar:
            return self._select_value(F.col(name))
        if self.is_scalar:
            vtype = self._df.schema[VALUE].dataType
            if isinstance(vtype, T.StructType) and name in vtype.fieldNames():
                return self._select_value(F.col(VALUE).getField(name))
            if isinstance(vtype, T.MapType):
                # dict-shaped elements infer as MapType: attr ≡ key lookup
                return self._select_value(F.col(VALUE).getItem(name))
        raise AttributeError(
            f"{name!r} is not a column/field of {self._df.columns}; "
            "(unknown names raise eagerly — deliberate upgrade over the reference)"
        )

    def __getitem__(self, key: Any) -> "ObjectFrame":
        if self._pickled:
            import operator as op

            return self._map_objects(op.itemgetter(key))
        if isinstance(key, (list, tuple)):
            if not self.is_scalar:
                return self._select_value(F.struct(*[F.col(k) for k in key]))
            return self._select_value(F.struct(*[F.col(VALUE).getItem(k) for k in key]))
        if not self.is_scalar:
            if key in self._df.columns:
                return self._select_value(F.col(key))
            raise KeyError(key)
        vtype = self._df.schema[VALUE].dataType
        if isinstance(vtype, T.ArrayType) and isinstance(key, int):
            # Python 0-based indexing
            return self._select_value(F.get(F.col(VALUE), key))
        if isinstance(key, slice):
            if isinstance(vtype, T.ArrayType):
                from dask_obj_spark.expr import slice_column

                return self._select_value(slice_column(F.col(VALUE), key))
            import operator as op

            return self._python_elementwise(op.itemgetter(key))
        return self._select_value(F.element_at(F.col(VALUE), F.lit(key)))

    # -- broadcast invocation (A4/A5) ----------------------------------------

    def call(self, method: str, *args, **kwargs) -> "ObjectFrame":
        """Per-element method call (reference ``core.py:74-76``): JVM
        dispatch table first, Python replay as the explicit fallback."""
        import operator as op

        caller = op.methodcaller(method, *args, **kwargs)
        if not self._pickled and self.is_scalar:
            col = dispatch_method(method, self._value_column(), *args, **kwargs)
            if col is not None:
                return self._select_value(col)
            # unknown method: sample one element to infer the result type,
            # then run the call as an Arrow-batched pandas UDF — columnar
            # storage survives; the pickled path is the LAST resort
            try:
                inferred = _spark_type_for(caller(self._head_element()))
            except Exception:
                inferred = None
            if inferred is not None:
                def _replay(s, _c=caller):
                    return s.map(_c)

                return self._select_value(F.pandas_udf(inferred)(_replay)(F.col(VALUE)))
        return self._python_elementwise(lambda o: caller(o))

    def __call__(self, *args, **kwargs) -> "ObjectFrame":
        """Collection of callables: invoke each with shared args (A4)."""
        return self._python_elementwise(lambda fn: fn(*args, **kwargs))

    # -- map / flatten / materialize (A6-A9) ----------------------------------

    def map(self, func: Callable, *args, compute: bool = False, **kwargs) -> Any:
        """Per-item function application, item FIRST (reference ``core.py:78-82``).

        Extra ``ObjectFrame`` args are zipped element-wise (dask bag
        semantics); scalars are passed through.
        """
        frames = [a for a in args if isinstance(a, ObjectFrame)]
        if frames:
            zipped = self
            for fr in frames:
                zipped = zipped.zip(fr)
            n = len(frames)
            # replace frame args by slot markers — an ObjectFrame must never
            # be captured in an executor closure (it holds the SparkSession)
            arg_slots = tuple("__zip_slot__" if isinstance(a, ObjectFrame) else a for a in args)

            def apply_zipped(tup, _args=arg_slots, _f=func, _kw=kwargs, _n=n):
                # zip() left-nests: (((e, f1), f2), f3) — unwrap exactly _n times
                flat: list = []
                cur = tup
                for _ in range(_n):
                    cur, right = cur
                    flat.append(right)
                flat.append(cur)
                flat.reverse()  # [elem, f1, f2, ...]
                elem, zvals = flat[0], iter(flat[1:])
                real = [next(zvals) if a == "__zip_slot__" else a for a in _args]
                return _f(elem, *real, **_kw)

            out = zipped._map_objects(apply_zipped)
        elif isinstance(func, Expr):
            out = self._apply_expr(func)
        else:
            out = self._python_elementwise(lambda o: func(o, *args, **kwargs))
        return out.compute() if compute else out

    def _apply_expr(self, e: Expr) -> "ObjectFrame":
        """Run a recorded :class:`Expr` columnar when native, replayed when pickled.

        Failure ladder: (1) pure-Column compile; (2) compile with a
        SAMPLED ``fallback_type`` — one element is evaluated driver-side
        to infer the result's Spark type, so the undispatchable tail runs
        as an Arrow-batched pandas UDF while the frame STAYS columnar;
        (3) only then the pickled replay path."""
        if self._pickled:
            return self._map_objects(e.eval)
        root = F.col(VALUE) if self.is_scalar else F.struct(*self._df.columns)
        try:
            return self._select_value(compile_expr(e, root))
        except Exception:
            pass
        try:
            inferred = _spark_type_for(e.eval(self._head_element()))
            if inferred is not None:
                return self._select_value(compile_expr(e, root, fallback_type=inferred))
        except Exception:
            pass
        return self._python_elementwise(e.eval)

    def _indexed_pickled(self) -> DataFrame:
        """(value binary, __ord__ long): the element with its position.

        A frame already carrying ``__ord__`` (itself zip-derived) keeps its
        ORIGINAL positions — physical row order of a join output is
        arbitrary, so chained zips must align on the persisted index, not
        on ``zipWithIndex`` over whatever order the shuffle produced."""
        p = self._to_pickled()
        if ORD in p._df.columns:
            return p._df.select(VALUE, ORD)
        rdd = p._df.rdd.zipWithIndex().map(lambda t: (bytes(t[0][0]), t[1]))
        schema = T.StructType(
            [T.StructField(VALUE, T.BinaryType()), T.StructField(ORD, T.LongType())]
        )
        return p._df.sparkSession.createDataFrame(rdd, schema=schema)

    def zip(self, other: "ObjectFrame") -> "ObjectFrame":
        """Positional zip of two collections → pickled tuples.

        ``zipWithIndex`` + a JVM-side equi-join on the index.  NO sort
        anywhere: the join is hinted shuffle-hash (sort-merge would add
        per-partition sorts), the position rides along as ``__ord__``,
        and ordering is settled driver-side at ``compute()``/``take()``
        — a k-element driver sort instead of a distributed global sort
        in every cross-collection operator's plan.
        """
        left = self._indexed_pickled().withColumnRenamed(VALUE, "__lv__")
        right = other._indexed_pickled().withColumnRenamed(VALUE, "__rv__")
        joined = left.join(right.hint("SHUFFLE_HASH"), ORD)

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                out = [
                    _dumps((pickle.loads(bytes(a)), pickle.loads(bytes(b))))
                    for a, b in zip(pdf["__lv__"], pdf["__rv__"])
                ]
                yield pd.DataFrame({VALUE: out, ORD: pdf[ORD]})

        merged = joined.mapInPandas(gen, f"{VALUE} binary, {ORD} long")
        return self._make(merged, pickled=True)

    def flatten(self, compute: bool = False) -> Any:
        """One-level flatten (reference ``core.py:93-96``) → ``explode``."""
        if self._pickled:
            out = self._flat_map_objects(lambda o: o)
        elif self.is_scalar and isinstance(self._df.schema[VALUE].dataType, T.ArrayType):
            out = self._select_value(F.explode(F.col(VALUE)))
        else:
            out = self._to_pickled()._flat_map_objects(lambda o: o)
        return out.compute() if compute else out

    def _flat_map_objects(self, fn: Callable[[Any], Iterable[Any]]) -> "ObjectFrame":
        import pandas as pd

        def gen(batches):
            for pdf in batches:
                out = []
                for b in pdf[VALUE]:
                    for item in fn(pickle.loads(bytes(b))):
                        out.append(_dumps(item))
                yield pd.DataFrame({VALUE: out})

        return self._make(self._df.mapInPandas(gen, f"{VALUE} binary"), pickled=True)

    def compute(self, flatten: bool = False) -> list:
        """Materialize to a Python list (reference ``core.py:84-88``)."""
        target = self.flatten() if flatten else self
        rows = target._df.collect()
        if target._pickled:
            if ORD in target._df.columns:
                rows.sort(key=lambda r: r[1])  # zip positions, settled here
            return [pickle.loads(bytes(r[0])) for r in rows]
        if target.is_scalar:
            return [r[0] for r in rows]
        return rows

    def persist(self) -> "ObjectFrame":
        self._df.persist()
        return self

    def repartition(self, npartitions: int, *cols) -> "ObjectFrame":
        return self._make(self._df.repartition(npartitions, *cols))

    def coalesce(self, npartitions: int) -> "ObjectFrame":
        return self._make(self._df.coalesce(npartitions))

    # -- reductions (A10-A12) -------------------------------------------------

    # Above this many partitions, reduction's combine rounds run on the
    # executors (coalesce + per-partition aggregate) instead of collecting
    # one partial per partition to the driver.
    _TREE_COMBINE_THRESHOLD = 1024

    def reduction(
        self,
        perpartition: Callable[[list], Any],
        aggregate: Callable[[list], Any],
        split_every: int | None = None,
        tree: bool | None = None,
    ) -> Any:
        """Generic two-phase aggregation (reference ``core.py:104-105``).

        ``perpartition`` runs distributed (one small partial per
        partition); partials are tree-combined with fan-in ``split_every``
        and ``aggregate`` is applied at least once — dask
        ``bag.reduction`` semantics (``aggregate`` may be applied to
        intermediate lists of partials, so it must be associative over
        partial groups, as in dask).

        Scale note: the default path collects ONE partial per partition to
        the driver and tree-combines there.  That is bounded — each
        partial is a small object by contract — but at ~100k partitions
        the driver fan-in (collect size + combine CPU) becomes the limit.
        ``tree=True`` (or automatically above ``_TREE_COMBINE_THRESHOLD``
        partitions) runs the combine rounds on the executors instead,
        the way RDD ``treeAggregate`` does: each round keys partial i by
        ``i // split_every`` — CONTIGUOUS groups — and shuffles into
        ``n = ceil(prev/split_every)`` reducers that each aggregate
        their ≤ ``split_every`` partials.  Every partial carries its
        original partition index through the shuffle and each group
        sorts by index before calling ``aggregate``, so the combine
        sees partials in deterministic partition order regardless of
        shuffle-fetch order — order-sensitive aggregates (fold with a
        non-commutative combine, float sums) give the same answer as
        the driver path.  The per-round shuffle carries only tiny
        partials, and — unlike a narrow ``coalesce`` chain, which Spark
        fuses into ONE stage of ``split_every`` tasks, silently
        collapsing the map phase's parallelism to the final fan-in
        (measured 6x slower at 2048 partitions) — the stage break keeps
        ``perpartition`` running at full cluster width.  The driver
        only ever sees the final ≤ ``split_every`` partials, sorted by
        group index before the driver-side combine.
        """
        def _per(it):
            items = list(it)
            return [perpartition(items)] if items else []  # skip empty partitions

        fan_in = split_every or 8
        rdd = self._element_rdd().mapPartitions(_per)
        if tree is None:
            tree = rdd.getNumPartitions() > self._TREE_COMBINE_THRESHOLD
        if tree:
            n = rdd.getNumPartitions()
            # (index, partial) pairs: the index rides the shuffle so each
            # round can restore deterministic partition order (empty
            # partitions leave gaps; // keying keeps groups contiguous)
            indexed = rdd.mapPartitionsWithIndex(
                lambda i, it: ((i, p) for p in it)
            )
            while n > fan_in:
                n = -(-n // fan_in)  # ceil
                indexed = (
                    indexed.map(lambda kv, _f=fan_in: (kv[0] // _f, kv))
                    .groupByKey(numPartitions=n)
                    .map(
                        lambda kv: (
                            kv[0],
                            aggregate(
                                [p for _, p in sorted(kv[1], key=lambda x: x[0])]
                            ),
                        )
                    )
                )
            partials = [p for _, p in sorted(indexed.collect())]
        else:
            partials = rdd.collect()
        # observable contract: with tree=True the driver fan-in is
        # bounded by split_every however many partitions fed the job
        # (asserted in tests/test_core.py and the b28 bench probe)
        self._last_reduction_driver_fanin = len(partials)
        if not partials:
            return aggregate([])
        while len(partials) > fan_in:
            partials = [
                aggregate(partials[i : i + fan_in]) for i in range(0, len(partials), fan_in)
            ]
        return aggregate(partials)

    def fold(self, binop: Callable, initial: Any = _EMPTY, combine: Callable | None = None) -> Any:
        comb = combine or binop

        def per(items: list) -> Any:
            return _fold_list(binop, items, initial)

        return self.reduction(per, lambda ps: functools.reduce(comb, ps))

    def counts(self, split_every: int | None = None) -> Counter:
        """Distributed value frequencies → ``collections.Counter``
        (reference ``counts``, ``core.py:107-108``).

        Native modes run as a two-phase hash aggregate
        (``groupBy().count()`` — partial+final, same shape the reference
        hand-builds with ``counter``/``sum_counts``, ``core.py:19-31``);
        pickled mode uses the generic reduction with ``Counter`` merge.
        """
        if not self._pickled:
            cols = [VALUE] if self.is_scalar else list(self._df.columns)
            rows = self._df.groupBy(*cols).count().collect()
            if self.is_scalar:
                return Counter({r[0]: r["count"] for r in rows})
            return Counter({tuple(r[:-1]): r[-1] for r in rows})
        return self.reduction(
            lambda items: Counter(items),
            lambda counters: functools.reduce(_merge_counters, counters, Counter()),
            split_every,
        )

    frequencies = counts

    # -- Tier D relational surface -------------------------------------------

    def _predicate(self, pred: Any) -> Column | None:
        if isinstance(pred, Column):
            return pred
        if isinstance(pred, Expr):
            try:
                root = F.col(VALUE) if self.is_scalar else F.struct(*self._df.columns)
                return compile_expr(pred, root)
            except Exception:
                return None
        return None

    def filter(self, pred: Any) -> "ObjectFrame":
        col = None if self._pickled else self._predicate(pred)
        if col is not None:
            return self._make(self._df.filter(col))
        # python predicate over elements (any mode)
        import pandas as pd

        pickled = self._pickled
        scalar = self.is_scalar
        cols = self._df.columns
        p = pred.eval if isinstance(pred, Expr) else pred

        def gen(batches):
            from pyspark.sql import Row

            for pdf in batches:
                if pickled:
                    mask = [bool(p(pickle.loads(bytes(b)))) for b in pdf[VALUE]]
                elif scalar:
                    mask = [bool(p(v)) for v in pdf[VALUE]]
                else:
                    mask = [
                        bool(p(Row(**dict(zip(cols, t)))))
                        for t in pdf.itertuples(index=False, name=None)
                    ]
                yield pdf[pd.Series(mask, index=pdf.index)]

        return self._make(self._df.mapInPandas(gen, self._df.schema))

    def remove(self, pred: Any) -> "ObjectFrame":
        col = None if self._pickled else self._predicate(pred)
        if col is not None:
            return self._make(self._df.filter(~col))
        p = pred.eval if isinstance(pred, Expr) else pred
        return self.filter(lambda o: not p(o))

    def distinct(self, key: str | None = None) -> "ObjectFrame":
        if key is None:
            return self._make(self._df.distinct())
        return self._make(self._df.dropDuplicates([key]))

    def groupby(self, grouper: Any) -> "ObjectFrame":
        """Full shuffle group → (key, [items]) pairs (bag.groupby).

        Prefer :meth:`foldby`/``agg_by`` — collect_list carries all values
        (documented in dask too; same tradeoff at scale).
        """
        if isinstance(grouper, str) and not self.is_scalar and grouper in self._df.columns:
            grouped = (
                self._df.groupBy(grouper)
                .agg(F.collect_list(F.struct(*self._df.columns)).alias("items"))
                .select(F.col(grouper).alias("key"), "items")
            )
            return self._make(grouped, pickled=False)
        # python grouper over elements
        keyed = self._element_rdd().groupBy(grouper if callable(grouper) else (lambda o: o[grouper]))
        out = keyed.map(lambda kv: (_dumps((kv[0], list(kv[1]))),))
        spark = self._df.sparkSession
        schema = T.StructType([T.StructField(VALUE, T.BinaryType())])
        return self._make(spark.createDataFrame(out, schema=schema), pickled=True)

    def foldby(
        self,
        key: Any,
        binop: Callable,
        initial: Any = _EMPTY,
        combine: Callable | None = None,
        combine_initial: Any = None,
    ) -> "ObjectFrame":
        """Per-key two-phase fold (bag.foldby — the efficient partial+final
        path dask docs push over groupby).  Runs as ``aggregateByKey`` so
        map-side combining happens before the shuffle.  The sentinel
        default keeps ``None``/falsy values usable as real initials."""
        comb = combine or binop
        keyfn = key if callable(key) else (lambda o, _k=key: o[_k])
        rdd = self._element_rdd().map(lambda o: (keyfn(o), o))
        if not isinstance(initial, _EmptySentinel):
            folded = rdd.aggregateByKey(initial, binop, comb)
        else:
            folded = rdd.reduceByKey(binop)
        out = folded.map(lambda kv: (_dumps(tuple(kv)),))
        spark = self._df.sparkSession
        schema = T.StructType([T.StructField(VALUE, T.BinaryType())])
        return self._make(spark.createDataFrame(out, schema=schema), pickled=True)

    def agg_by(self, keys: list[str] | str, *aggs: Column) -> "ObjectFrame":
        """Columnar foldby: named-column groupBy + Catalyst aggregates."""
        keys = [keys] if isinstance(keys, str) else list(keys)
        return self._make(self._df.groupBy(*keys).agg(*aggs), pickled=False)

    def topk(self, k: int, key: str | Column | None = None) -> "ObjectFrame":
        """Top-k (bag.topk) → ``TakeOrderedAndProject`` (no full sort)."""
        if key is None:
            key = self._value_column()
        elif isinstance(key, str):
            key = F.col(key)
        return self._make(self._df.orderBy(key.desc()).limit(k))

    # scalar aggregates (bag.max/min/sum/mean/std/var/count/any/all)
    def _scalar_agg(self, col: Column) -> Any:
        return self._df.agg(col.alias("r")).collect()[0][0]

    def max(self) -> Any:
        return self._scalar_agg(F.max(self._value_column()))

    def min(self) -> Any:
        return self._scalar_agg(F.min(self._value_column()))

    def sum(self) -> Any:
        return self._scalar_agg(F.sum(self._value_column()))

    def mean(self) -> Any:
        return self._scalar_agg(F.mean(self._value_column()))

    def std(self, ddof: int = 0) -> Any:
        fn = F.stddev_pop if ddof == 0 else F.stddev_samp
        return self._scalar_agg(fn(self._value_column()))

    def var(self, ddof: int = 0) -> Any:
        fn = F.var_pop if ddof == 0 else F.var_samp
        return self._scalar_agg(fn(self._value_column()))

    def count(self) -> int:
        return self._df.count()

    def any(self) -> bool:
        return bool(self._scalar_agg(F.max(self._value_column().cast("boolean"))))

    def all(self) -> bool:
        return bool(self._scalar_agg(F.min(self._value_column().cast("boolean"))))

    def accumulate(self, binop: Callable, initial: Any = _EMPTY) -> "ObjectFrame":
        """Prefix scan (bag.accumulate): classic two-pass distributed scan —
        per-partition fold, driver-side exclusive prefix of the (tiny)
        per-partition results, then a re-scan with the carried prefix.

        toolz/dask semantics: with an ``initial`` the output has n+1
        elements and starts with the initial itself; the sentinel default
        keeps ``None`` usable as a real initial value."""
        has_initial = not isinstance(initial, _EmptySentinel)
        rdd = self._element_rdd()
        parts = rdd.mapPartitionsWithIndex(
            lambda i, it: [(i, _fold_list(binop, list(it)))]  # fold WITHOUT initial:
        ).collect()  # the initial enters exactly once, via the driver-side carry
        parts.sort()
        prefix: dict[int, Any] = {}
        carry: Any = initial if has_initial else _EMPTY
        for idx, folded in parts:
            prefix[idx] = carry
            if not isinstance(folded, _EmptySentinel):
                carry = folded if isinstance(carry, _EmptySentinel) else binop(carry, folded)
        first_idx = parts[0][0] if parts else 0

        def scan(idx, it):
            acc = prefix.get(idx, _EMPTY)
            if has_initial and idx == first_idx:
                yield acc  # the n+1'th element: the initial leads the output
            for x in it:
                acc = x if isinstance(acc, _EmptySentinel) else binop(acc, x)
                yield acc

        out = rdd.mapPartitionsWithIndex(scan).map(lambda v: (_dumps(v),))
        spark = self._df.sparkSession
        schema = T.StructType([T.StructField(VALUE, T.BinaryType())])
        return self._make(spark.createDataFrame(out, schema=schema), pickled=True)

    def join(self, other: "ObjectFrame | DataFrame", on: Any, how: str = "inner", broadcast: bool = False) -> "ObjectFrame":
        right = other._df if isinstance(other, ObjectFrame) else other
        if broadcast:
            right = F.broadcast(right)
        return self._make(self._df.join(right, on, how), pickled=False)

    def product(self, other: "ObjectFrame | DataFrame") -> "ObjectFrame":
        right = other._df if isinstance(other, ObjectFrame) else other
        return self._make(self._df.crossJoin(right), pickled=False)

    def union(self, other: "ObjectFrame") -> "ObjectFrame":
        return self._make(self._df.unionByName(other._df))

    def intersect(self, other: "ObjectFrame") -> "ObjectFrame":
        return self._make(self._df.intersect(other._df))

    def subtract(self, other: "ObjectFrame") -> "ObjectFrame":
        return self._make(self._df.exceptAll(other._df))

    def starmap(self, func: Callable) -> "ObjectFrame":
        return self.map(lambda t: func(*t))

    def map_partitions(self, func: Callable[[Iterable], Iterable]) -> "ObjectFrame":
        rdd = self._element_rdd().mapPartitions(lambda it: [(_dumps(v),) for v in func(it)])
        spark = self._df.sparkSession
        schema = T.StructType([T.StructField(VALUE, T.BinaryType())])
        return self._make(spark.createDataFrame(rdd, schema=schema), pickled=True)

    def random_sample(self, prob: float, seed: int | None = None) -> "ObjectFrame":
        return self._make(self._df.sample(fraction=prob, seed=seed))

    def take(self, k: int) -> list:
        if ORD in self._df.columns:
            # positional frame: first k BY POSITION — TakeOrderedAndProject
            # (bounded top-k per partition), not limit-of-arbitrary-rows
            rows = self._df.orderBy(ORD).take(k)
            return [pickle.loads(bytes(r[0])) for r in rows]
        head = self._make(self._df.limit(k))
        return head.compute()

    def first(self) -> Any:
        taken = self.take(1)
        return taken[0] if taken else None

    def order_by(self, *cols, ascending: bool = True) -> "ObjectFrame":
        cs = [F.col(c) if isinstance(c, str) else c for c in cols]
        if not ascending:
            cs = [c.desc() for c in cs]
        return self._make(self._df.orderBy(*cs))

    # -- sinks ----------------------------------------------------------------

    def to_parquet(self, path: str, mode: str = "overwrite", **opts) -> None:
        self._df.write.mode(mode).options(**opts).parquet(path)

    def to_textfiles(self, path: str, mode: str = "overwrite") -> None:
        df = self._df
        if not (self.is_scalar and isinstance(df.schema[VALUE].dataType, T.StringType)):
            df = df.select(F.to_json(F.struct(*df.columns)).alias(VALUE))
        df.write.mode(mode).text(path)

    def to_pandas(self):
        return self._df.toPandas()


def _merge_counters(a: Counter, b: Counter) -> Counter:
    a.update(b)
    return a


# uniform operator broadcasting (documented deviation: the reference's
# DaskObjects lacks dunders — special-method lookup bypasses __getattr__,
# SURVEY.md Appendix A; we support them uniformly like DaskDelayedObjects
# core.py:180-220)
def _of_make_binary(opname: str, reflected: bool):
    import operator as op

    from dask_obj_spark.expr import _BINARY_OPS, _COLUMN_BINARY

    pyfn = _BINARY_OPS[opname]
    colfn = _COLUMN_BINARY[opname]

    def method(self: ObjectFrame, other: Any):
        if not self._pickled and self.is_scalar and not isinstance(other, ObjectFrame):
            col = colfn(other, self._value_column()) if reflected else colfn(self._value_column(), other)
            return self._select_value(col)
        if isinstance(other, ObjectFrame):
            zipped = self.zip(other)
            return zipped._map_objects(lambda t: pyfn(t[1], t[0]) if reflected else pyfn(t[0], t[1]))
        return self._python_elementwise(
            (lambda o: pyfn(other, o)) if reflected else (lambda o: pyfn(o, other))
        )

    method.__name__ = f"__{'r' if reflected else ''}{opname}__"
    return method


def _of_make_unary(opname: str):
    from dask_obj_spark.expr import _UNARY_OPS, _COLUMN_UNARY

    pyfn = _UNARY_OPS[opname]
    colfn = _COLUMN_UNARY[opname]

    def method(self: ObjectFrame):
        if not self._pickled and self.is_scalar:
            return self._select_value(colfn(self._value_column()))
        return self._python_elementwise(pyfn)

    method.__name__ = f"__{opname}__"
    return method


from dask_obj_spark.expr import _BINARY_OPS as _BIN, _UNARY_OPS as _UN  # noqa: E402

for _name in _BIN:
    setattr(ObjectFrame, f"__{_name}__", _of_make_binary(_name, False))
    if _name not in ("lt", "le", "eq", "ne", "gt", "ge"):
        setattr(ObjectFrame, f"__r{_name}__", _of_make_binary(_name, True))
for _name in _UN:
    setattr(ObjectFrame, f"__{_name}__", _of_make_unary(_name))
