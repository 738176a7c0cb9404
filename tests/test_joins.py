"""Temporal joins + grouped top-k (rayfts.ops.joins): known-answer
edge cases, DuckDB equality over the real events table, and a
random-stream property check (the operators are original additions —
the reference engine has no joins; see SURVEY.md §2.5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def _typed(ds, t):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], t)),
        batch_format="pyarrow")


def test_asof_join_known_answers(ray_session):
    """Backward-inclusive: equal ts matches; tie on right ts picks the
    larger right id; a left row before any right is dropped; keys stay
    independent."""
    from rayfts.ops.joins import asof_join

    left = pa.table({
        "ts": pa.array([100, 50, 10, 100], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "event_id": pa.array([10, 11, 12, 13], type=pa.int64()),
    })
    right = pa.table({
        "ts": pa.array([100, 100, 40, 999], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 1], type=pa.int64()),
        "event_id": pa.array([20, 21, 22, 23], type=pa.int64()),
    })
    rows = sorted(
        (r["id"], r["matched_id"], r["lag_us"])
        for r in asof_join(ray.data.from_arrow(left),
                           ray.data.from_arrow(right)).take_all())
    assert rows == [
        (10, 21, 0),   # ts tie on the right -> larger right id (21 > 20)
        (11, 22, 10),  # latest right at-or-before 50 is ts=40
        # id 12 (ts=10): no right at-or-before -> dropped (inner as-of)
        # id 13 (user 2): right side has no user-2 rows -> dropped
    ]


def test_key_range_join_window_half_open(ray_session):
    """Window is [left.ts, left.ts + W): the left endpoint matches, the
    right endpoint does not; every in-window right pairs (not just the
    first); keys stay independent."""
    from rayfts.ops.joins import key_range_join

    W_SEC = 1  # window = 1_000_000 us
    left = pa.table({
        "ts": pa.array([0, 10], type=pa.int64()),
        "user_id": pa.array([1, 2], type=pa.int64()),
        "event_id": pa.array([1, 2], type=pa.int64()),
    })
    right = pa.table({
        "ts": pa.array([0, 999_999, 1_000_000, 500], type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
        "event_id": pa.array([30, 31, 32, 33], type=pa.int64()),
    })
    rows = sorted(
        (r["left_id"], r["right_id"], r["delta_us"])
        for r in key_range_join(ray.data.from_arrow(left),
                                ray.data.from_arrow(right),
                                window_sec=W_SEC).take_all())
    assert rows == [
        (1, 30, 0),        # left endpoint inclusive
        (1, 31, 999_999),  # strictly inside
        # (1, 32): ts == left.ts + W -> excluded (half-open)
        (2, 33, 490),      # key 2 independent
    ]


def test_top_k_per_group_ties_and_truncation(ray_session):
    """Rank orders by value desc then id asc; a group smaller than k
    emits all its rows; the per-batch combiner (many tiny blocks) does
    not change the answer."""
    from rayfts.ops.joins import top_k_per_group

    tbl = pa.table({
        "event_type": pa.array(["a"] * 4 + ["b"]),
        "value": pa.array([5.0, 5.0, 1.0, 9.0, 2.0]),
        "event_id": pa.array([4, 3, 2, 1, 0], type=pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(5)  # one row per block
    rows = sorted(
        (r["event_type"], r["rank"], r["event_id"], r["value"])
        for r in top_k_per_group(
            ds, "event_type", "value", "event_id", k=2).take_all())
    assert rows == [
        ("a", 1, 1, 9.0),
        ("a", 2, 3, 5.0),  # value tie 5.0: id 3 beats id 4
        ("b", 1, 0, 2.0),
    ]


def test_joins_match_duckdb_events(ray_session):
    """All three operators vs DuckDB SQL over the real events table."""
    import duckdb

    from rayfts.ops.joins import asof_join, key_range_join, top_k_per_group

    ev = ray.data.read_parquet(f"{SF}/events.parquet")

    got = sorted(
        (r["id"], r["key"], r["ts_us"], r["matched_id"], r["matched_ts_us"],
         r["lag_us"])
        for r in asof_join(_typed(ev, "purchase"),
                           _typed(ev, "click")).take_all())
    exp = duckdb.sql(f"""
WITH u AS (
  SELECT epoch_us(ts) AS ts_us, user_id, event_id,
         (event_type = 'purchase') AS is_left
  FROM read_parquet('{SF}/events.parquet')
  WHERE event_type IN ('purchase', 'click')
),
o AS (
  SELECT *,
    max(CASE WHEN NOT is_left
             THEN struct_pack(mts := ts_us, mid := event_id) END)
      OVER (PARTITION BY user_id ORDER BY ts_us, is_left, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lr
  FROM u
)
SELECT event_id, user_id, ts_us, lr.mid, lr.mts, ts_us - lr.mts
FROM o WHERE is_left AND lr IS NOT NULL ORDER BY event_id""").fetchall()
    assert got == [tuple(r) for r in exp]

    got_r = sorted(
        (r["left_id"], r["right_id"], r["key"], r["delta_us"])
        for r in key_range_join(_typed(ev, "signup"), _typed(ev, "purchase"),
                                window_sec=86400).take_all())
    exp_r = duckdb.sql(f"""
SELECT s.event_id, p.event_id, s.user_id, epoch_us(p.ts) - epoch_us(s.ts)
FROM read_parquet('{SF}/events.parquet') s
JOIN read_parquet('{SF}/events.parquet') p
  ON p.user_id = s.user_id
 AND s.event_type = 'signup' AND p.event_type = 'purchase'
 AND epoch_us(p.ts) >= epoch_us(s.ts)
 AND epoch_us(p.ts) - epoch_us(s.ts) < 86400000000
ORDER BY 1, 2""").fetchall()
    assert got_r == [tuple(r) for r in exp_r]

    got_k = sorted(
        (r["event_type"], r["rank"], r["event_id"], r["value"])
        for r in top_k_per_group(ev, "event_type", "value", "event_id",
                                 k=5).take_all())
    exp_k = duckdb.sql(f"""
SELECT event_type, rank, event_id, value FROM (
  SELECT event_type, event_id, value,
    CAST(row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS BIGINT) AS rank
  FROM read_parquet('{SF}/events.parquet'))
WHERE rank <= 5 ORDER BY 1, 2""").fetchall()
    assert got_k == [tuple(r) for r in exp_k]


def test_joins_property_random_streams(ray_session):
    """Property: asof + range join equal a brute-force pandas reference
    on random streams (duplicate timestamps on both sides, lefts before
    any right, keys present on one side only). Also pins that a tiny
    tile_pairs produces identical range-join output."""
    from rayfts.ops.joins import asof_join, key_range_join

    rng = np.random.default_rng(11)
    for trial in range(3):
        nl, nr = int(rng.integers(20, 120)), int(rng.integers(20, 120))
        mk = lambda n, base: pa.table({
            "ts": pa.array(rng.integers(0, 5000, n).astype(np.int64) * 7,
                           type=pa.int64()),
            "user_id": pa.array(rng.integers(0, 6, n), type=pa.int64()),
            "event_id": pa.array(np.arange(base, base + n), type=pa.int64()),
        })
        lt, rt = mk(nl, 0), mk(nr, 10_000)
        ldf, rdf = lt.to_pandas(), rt.to_pandas()

        want = []
        for _, l in ldf.iterrows():
            cand = rdf[(rdf.user_id == l.user_id) & (rdf.ts <= l.ts)]
            if len(cand):
                best = cand.sort_values(["ts", "event_id"]).iloc[-1]
                want.append((l.event_id, best.event_id, l.ts - best.ts))
        got = sorted(
            (r["id"], r["matched_id"], r["lag_us"])
            for r in asof_join(ray.data.from_arrow(lt),
                               ray.data.from_arrow(rt)).take_all())
        assert got == sorted(want), f"asof trial {trial}"

        W_US = 1_000 * 1_000_000
        m = ldf.merge(rdf, on="user_id", suffixes=("_l", "_r"))
        m = m[(m.ts_r >= m.ts_l) & (m.ts_r - m.ts_l < W_US)]
        want_r = sorted(zip(m.event_id_l, m.event_id_r, m.ts_r - m.ts_l))
        for tile in (1 << 20, 7):
            got_r = sorted(
                (r["left_id"], r["right_id"], r["delta_us"])
                for r in key_range_join(
                    ray.data.from_arrow(lt), ray.data.from_arrow(rt),
                    window_sec=1_000, tile_pairs=tile).take_all())
            assert got_r == want_r, f"range trial {trial} tile {tile}"


def test_asof_chunked_equals_plain(ray_session):
    """Hot-key-safe two-phase plan (hash(key, time-chunk) partitioning +
    boundary-state carries) returns EXACTLY the plain plan's rows —
    random streams including one hot key holding half of all events,
    chunk small enough that every key spans many chunks."""
    from rayfts.ops.joins import asof_join

    rng = np.random.default_rng(11)
    n_l, n_r = 1500, 1500
    # keys 0..9; key 0 is hot (p=0.5); timestamps over ~200 chunk widths
    pk = np.array([0.5] + [0.5 / 9] * 9)

    def mk(n, base):
        return pd.DataFrame({
            "event_id": np.arange(base, base + n, dtype=np.int64),
            "user_id": rng.choice(10, size=n, p=pk).astype(np.int64),
            "ts": pd.to_datetime(
                rng.integers(0, 200 * 7 * 1_000_000, size=n), unit="us"),
        })
    left, right = mk(n_l, 0), mk(n_r, 1_000_000)
    lds = ray.data.from_pandas(left).repartition(7)
    rds = ray.data.from_pandas(right).repartition(5)

    plain = (asof_join(lds, rds).to_pandas()
             .sort_values("id").reset_index(drop=True))
    chunked = (asof_join(lds, rds, hot_key_chunk_sec=7).to_pandas()
               .sort_values("id").reset_index(drop=True))
    assert plain.equals(chunked[plain.columns]), (
        len(plain), len(chunked))
    assert len(plain) > 0


def test_asof_chunked_carry_across_empty_chunks(ray_session):
    """A left chunk with no rights anywhere near it still matches a
    right event many empty chunks earlier (the boundary carry must
    target LEFT chunks, not just chunks that contain rights)."""
    from rayfts.ops.joins import asof_join

    left = pd.DataFrame({
        "event_id": np.array([1, 2], dtype=np.int64),
        "user_id": np.array([5, 5], dtype=np.int64),
        "ts": pd.to_datetime([900_000_000, 901_000_000], unit="us"),
    })
    right = pd.DataFrame({
        "event_id": np.array([77], dtype=np.int64),
        "user_id": np.array([5], dtype=np.int64),
        "ts": pd.to_datetime([3_000_000], unit="us"),  # ~897 s earlier
    })
    out = (asof_join(ray.data.from_pandas(left),
                     ray.data.from_pandas(right), hot_key_chunk_sec=1)
           .to_pandas().sort_values("id").reset_index(drop=True))
    assert out.id.tolist() == [1, 2]
    assert out.matched_id.tolist() == [77, 77]
    assert (out.matched_ts_us == 3_000_000).all()


def test_top_k_per_group_int_key(ray_session):
    # non-string group keys preserve their type (ADVICE r03)
    import ray

    from rayfts.ops.joins import top_k_per_group

    df = pd.DataFrame({
        "g": np.repeat(np.arange(5, dtype=np.int64), 10),
        "v": np.arange(50, dtype=np.float64),
        "i": np.arange(50, dtype=np.int64),
    })
    out = top_k_per_group(
        ray.data.from_pandas(df).repartition(3), "g", "v", "i", k=2
    ).to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
    assert out["g"].dtype == np.int64
    exp = (df.sort_values(["g", "v"], ascending=[True, False])
           .groupby("g").head(2))
    assert set(map(tuple, out[["g", "i"]].to_numpy())) == \
        set(map(tuple, exp[["g", "i"]].to_numpy()))
