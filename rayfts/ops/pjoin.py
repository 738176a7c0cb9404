"""Join-free partitioned equi-join primitives.

Ray 2.49's ``Dataset.join`` runs through hash-shuffle aggregator actors
(``HashShuffleAggregator``), the one Ray Data operator this repo has
seen fail intermittently: besides the documented union-lineage wart
(schema-less empty right partitions -> ArrowInvalid), long driver
sessions occasionally hit an ArrowInvalid inside ``finalize()`` on
perfectly join-safe lineages (observed under the pytest session gate;
see BASELINE.md "Ray 2.49 union-lineage join wart"). Every remaining
``ds.join`` call site in this repo was a fall-over path behind a
broadcast budget; this module replaces them with the repo's established
reduce idiom — tag a uniform hash partition column, one SORT-based
``groupby(__pp)`` exchange (never the hash-shuffle aggregators), and a
fully vectorized ``searchsorted`` probe inside each partition group —
so the engine carries zero dependence on the hash-join operator.

Scale notes (100 TB): the exchange moves each side exactly once, keyed
by a golden-ratio-mixed uniform partition id, so there is no skew even
for sequential keys; ``num_parts`` bounds per-reduce-task memory
(group size ~ input/num_parts) and should be raised with cluster size
exactly like the repo's other partitioned reducers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix_mod(vals: np.ndarray, num_parts: int) -> np.ndarray:
    """Uniform partition ids from (possibly sequential) int keys."""
    with np.errstate(over="ignore"):
        h = vals.astype(np.uint64) * _GOLDEN
    return ((h >> np.uint64(33)) % np.uint64(num_parts)).astype(np.int32)


def semi_join_partitioned(
    left_ds,
    keys_ds,
    *,
    left_key: str,
    right_key: str,
    left_schema: dict,
    num_parts: int = 64,
):
    """Rows of ``left_ds`` whose integral ``left_key`` value appears in
    ``keys_ds[right_key]`` — distributed set membership with no
    ``Dataset.join``.

    ``left_schema`` is an ordered ``{name: pa.DataType}`` covering EVERY
    left column (including the key): the two tagged sides cross one
    ``union`` + ``groupby`` exchange, which requires a single fixed
    schema, so the left side is cast to it and the key side null-fills
    the non-key columns. The key must be integral (cast to int64).
    """
    names = list(left_schema)
    target = pa.schema(
        [pa.field(n, left_schema[n]) for n in names]
        + [pa.field("__side", pa.int8()), pa.field("__pp", pa.int32())]
    )
    key_type = left_schema[left_key]

    def tag_left(b: pa.Table) -> pa.Table:
        keys = b[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        t = b.select(names)
        t = t.append_column("__side", pa.array(np.zeros(len(b), np.int8)))
        t = t.append_column("__pp", pa.array(_mix_mod(keys, num_parts)))
        return t.cast(target)

    def tag_right(b: pa.Table) -> pa.Table:
        keys = b[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = [
            pa.array(keys, type=pa.int64()).cast(key_type)
            if n == left_key
            else pa.nulls(len(b), left_schema[n])
            for n in names
        ]
        cols.append(pa.array(np.ones(len(b), np.int8)))
        cols.append(pa.array(_mix_mod(keys, num_parts)))
        return pa.table(dict(zip(names + ["__side", "__pp"], cols))).cast(target)

    def probe(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0))
        if left.num_rows == 0:
            return left.drop_columns(["__side", "__pp"])
        wanted = np.unique(
            g[left_key].to_numpy(zero_copy_only=False)[side == 1].astype(np.int64)
        )
        vals = left[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        if wanted.size == 0:
            mask = np.zeros(vals.size, bool)
        else:
            pos = np.searchsorted(wanted, vals)
            pos[pos >= wanted.size] = 0
            mask = wanted[pos] == vals
        return left.filter(pa.array(mask)).drop_columns(["__side", "__pp"])

    tagged_left = left_ds.map_batches(tag_left, batch_format="pyarrow")
    tagged_right = keys_ds.map_batches(tag_right, batch_format="pyarrow")
    return (
        tagged_left.union(tagged_right)
        .groupby("__pp")
        .map_groups(probe, batch_format="pyarrow")
    )
