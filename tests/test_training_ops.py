"""Round-3 training-data-pipeline operators: stratified sampling, sequence
packing (token-budget shard assignment), PII redaction, repetition stats,
benchmark decontamination, interval join."""

import numpy as np
import pyarrow as pa
import pytest


class TestStratifiedSample:
    def test_per_group_fractions_and_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.splits import (
            sample_deterministic,
            stratified_sample,
        )

        n = 6000
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array(
                    ["en", "de", "fr"][i % 3] for i in range(n)
                ),
            }
        )

        def ids(nblocks):
            return {
                r["doc_id"]
                for r in stratified_sample(
                    ray.data.from_arrow(t).repartition(nblocks),
                    "doc_id",
                    "lang",
                    {"en": 0.1, "de": 0.5},
                    default_fraction=1.0,
                ).take_all()
            }

        a = ids(2)
        assert ids(9) == a, "partitioning must not matter"
        by_lang = {"en": 0, "de": 0, "fr": 0}
        langs = t["lang"].to_pylist()
        for i in a:
            by_lang[langs[i]] += 1
        assert abs(by_lang["en"] / (n / 3) - 0.1) < 0.03
        assert abs(by_lang["de"] / (n / 3) - 0.5) < 0.05
        assert by_lang["fr"] == n / 3, "default 1.0 keeps every row"
        # per-group membership must agree with the flat rule at the same
        # fraction (same md5 threshold ⇒ rebalancing nests)
        flat10 = {
            r["doc_id"]
            for r in sample_deterministic(
                ray.data.from_arrow(t), "doc_id", 0.1
            ).take_all()
        }
        assert {i for i in a if langs[i] == "en"} == {
            i for i in flat10 if langs[i] == "en"
        }


class TestDomainMix:
    def test_rates_invariance_and_monotone_budget(self, ray_session):
        import ray.data

        from overmatch_ray.stages.splits import domain_mix

        n = 6000
        # en: heavy docs (9 tokens), de: light (3), xx: unlisted domain
        langs = ["en", "de", "xx"]
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array(langs[i % 3] for i in range(n)),
                "n_tok": pa.array(
                    [9, 3, 5][i % 3] for i in range(n)
                ),
            }
        )
        weights = {"en": 0.5, "de": 0.5}

        def sample(nblocks, bf):
            return {
                r["doc_id"]
                for r in domain_mix(
                    ray.data.from_arrow(t).repartition(nblocks),
                    "doc_id", "lang", "n_tok",
                    target_weights=weights, budget_fraction=bf,
                ).take_all()
            }

        a = sample(2, 0.3)
        assert sample(7, 0.3) == a, "partitioning must not matter"
        lang_of = t["lang"].to_pylist()
        assert not any(lang_of[i] == "xx" for i in a), "unlisted → dropped"
        # measured masses: en 9n/3, de 3n/3, total (9+3+5)n/3.
        # rate_en = 0.3·17/(2·9) ≈ 0.283, rate_de = 0.3·17/(2·3) = 0.85
        by = {"en": 0, "de": 0}
        for i in a:
            by[lang_of[i]] += 1
        assert abs(by["en"] / (n / 3) - 0.3 * 17 / 18) < 0.04
        assert abs(by["de"] / (n / 3) - 0.85) < 0.04
        # same token budget per listed domain, to within doc granularity
        # (that is the point of the op): 9·n_en ≈ 3·n_de
        assert abs(9 * by["en"] - 3 * by["de"]) / (3 * by["de"]) < 0.15
        # a bigger budget only ADDS documents (monotone curriculum)
        assert a <= sample(2, 0.6)
        # rate cap: a budget that wants more de than exists keeps all de
        big = sample(2, 1.2)
        assert sum(1 for i in big if lang_of[i] == "de") == n / 3


class TestFilterByGroupQuantile:
    def test_matches_reference_and_invariance(self, ray_session):
        import numpy as np
        import ray.data

        from overmatch_ray.stages.groupops import filter_by_group_quantile

        rng = np.random.default_rng(11)
        n = 3000
        groups = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
        vals = rng.integers(0, 50, n)
        t = pa.table(
            {
                "rid": pa.array(range(n), pa.int64()),
                "g": pa.array(groups),
                "v": pa.array(vals, pa.int64()),
            }
        )

        def got(nblocks, keep):
            return {
                r["rid"]
                for r in filter_by_group_quantile(
                    ray.data.from_arrow(t).repartition(nblocks),
                    "g", "v", 0.5, keep=keep,
                ).take_all()
            }

        # reference: numpy per-group linear-interpolated median
        want = set()
        for g in "abc":
            sel = groups == g
            med = np.quantile(vals[sel].astype(np.float64), 0.5)
            want |= set(np.flatnonzero(sel & (vals >= med)).tolist())
        a = got(2, "ge")
        assert a == want
        assert got(9, "ge") == a, "partitioning must not matter"
        # "le" keeps the complement plus the boundary rows
        le = got(2, "le")
        assert le | a == set(range(n)) and (le & a)  # boundary overlaps


class TestPackSequences:
    def test_matches_sequential_reference(self, ray_session):
        import ray.data

        from overmatch_ray.stages.splits import pack_sequences

        rng = np.random.default_rng(7)
        n = 4000
        ids = np.arange(n, dtype=np.int64)
        w = rng.integers(1, 400, n).astype(np.int64)
        t = pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(w)})
        budget = 2048
        expect = (np.cumsum(w) - w) // budget

        for nblocks, rs, nb in [(3, 1 << 20, 8), (11, 256, 32), (5, 64, 4)]:
            out = pack_sequences(
                ray.data.from_arrow(t).repartition(nblocks),
                "doc_id",
                "n_tokens",
                budget,
                range_size=rs,
                num_buckets=nb,
            ).take_all()
            got = {r["doc_id"]: r["shard_id"] for r in out}
            assert len(got) == n
            assert all(got[i] == expect[i] for i in range(n)), (
                f"shard mismatch at range_size={rs}"
            )

    def test_sparse_noncontiguous_ids(self, ray_session):
        """Gaps and id ranges with no rows must not shift the prefix."""
        import ray.data

        from overmatch_ray.stages.splits import pack_sequences

        ids = np.array([5, 100, 101, 9000, 9001, 70000], dtype=np.int64)
        w = np.array([10, 20, 30, 40, 50, 60], dtype=np.int64)
        t = pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(w)})
        out = pack_sequences(
            ray.data.from_arrow(t), "doc_id", "n_tokens", 64, range_size=128
        ).take_all()
        expect = (np.cumsum(w) - w) // 64
        got = {r["doc_id"]: r["shard_id"] for r in out}
        assert got == {int(i): int(e) for i, e in zip(ids, expect)}


class TestRedactPii:
    def test_patterns_and_order(self):
        from overmatch_ray.stages.pii import redact_pii_batch

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "mail bob.smith+x@foo-bar.org now",
                        "server at 10.2.3.4 and 255.255.255.255",
                        "call +1-555-0042 or +44-123-4567",
                        "clean text no pii",
                    ]
                ),
            }
        )
        out = redact_pii_batch(t)
        clean = out["clean_text"].to_pylist()
        assert clean[0] == "mail <EMAIL> now"
        assert clean[1] == "server at <IP> and <IP>"
        assert clean[2] == "call <PHONE> or <PHONE>"
        assert clean[3] == "clean text no pii"
        assert out["n_emails"].to_pylist() == [1, 0, 0, 0]
        assert out["n_ips"].to_pylist() == [0, 2, 0, 0]
        assert out["n_phones"].to_pylist() == [0, 0, 2, 0]

    def test_phone_never_rematches_redacted_ip(self):
        from overmatch_ray.stages.pii import redact_pii_batch

        t = pa.table(
            {"text": pa.array(["ip 1.222.333.4444 stays an ip match"])}
        )
        out = redact_pii_batch(t)
        assert out["n_phones"].to_pylist() == [0]


class TestRepetitionStats:
    def test_hand_computed(self):
        from overmatch_ray.stages.textstats import repetition_stats_batch

        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        "a a a a",          # one word repeated
                        "x y x y x",        # alternating
                        "unique words only here",
                    ]
                ),
            }
        )
        out = repetition_stats_batch(t)
        assert out["n_words"].to_pylist() == [4, 5, 4]
        assert out["n_unique_words"].to_pylist() == [1, 2, 4]
        assert out["top_word_frac"].to_pylist() == [1.0, 0.6, 0.25]
        # doc0 bigrams: 'a a' ×3 → 1 distinct of 3 → dup 2/3
        # doc1 bigrams: x y, y x, x y, y x → 2 distinct of 4 → 0.5
        d = out["dup_2gram_frac"].to_pylist()
        assert d[0] == round(1 - 1 / 3, 6)
        assert d[1] == 0.5 and d[2] == 0.0

    def test_boundary_bigrams_not_cross_doc(self):
        from overmatch_ray.stages.textstats import repetition_stats_batch

        t = pa.table({"text": pa.array(["p q", "q p"])})
        out = repetition_stats_batch(t)
        assert out["dup_2gram_frac"].to_pylist() == [0.0, 0.0]


class TestDecontaminate:
    def test_overlap_flags(self, ray_session):
        import ray.data

        from overmatch_ray.stages.decontam import decontaminate

        words = [f"w{i}" for i in range(40)]
        corpus = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(
                    [
                        " ".join(words[:20]),        # contains bench 8-gram
                        " ".join(words[20:40]),      # disjoint
                        " ".join(reversed(words[:20])),  # same words, wrong order
                    ]
                ),
            }
        )
        bench = pa.table(
            {
                "doc_id": pa.array([100], pa.int64()),
                "text": pa.array(["pre " + " ".join(words[5:13]) + " post"]),
            }
        )
        out = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(
                ray.data.from_arrow(corpus), ray.data.from_arrow(bench), n=8
            ).take_all()
        }
        assert out == {0: True, 1: False, 2: False}

    def test_short_docs_never_flagged(self, ray_session):
        import ray.data

        from overmatch_ray.stages.decontam import decontaminate

        corpus = pa.table(
            {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a b c"])}
        )
        bench = pa.table(
            {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["a b c"])}
        )
        out = decontaminate(
            ray.data.from_arrow(corpus), ray.data.from_arrow(bench), n=8
        ).take_all()
        assert out[0]["contaminated"] is False or out[0]["contaminated"] == False  # noqa: E712


class TestIntervalJoin:
    def _run(self, left, right, ray_session_unused=None, **kw):
        import ray.data

        from overmatch_ray.stages.joins import interval_join

        return interval_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right), **kw
        ).take_all()

    def test_boundaries_and_multi_granule(self, ray_session):
        left = pa.table(
            {
                "lid": pa.array([0, 1, 2, 3], pa.int64()),
                "x": pa.array([10, 99, 100, 250], pa.int64()),
            }
        )
        right = pa.table(
            {
                "rid": pa.array([7, 8], pa.int64()),
                "s": pa.array([10, 240], pa.int64()),
                "e": pa.array([100, 260], pa.int64()),  # [10,100) spans 10 granules at g=10
            }
        )
        rows = self._run(
            left, right, on="x", start_col="s", end_col="e", granule=10
        )
        got = {(r["lid"], r["rid"]) for r in rows}
        # x=10 in [10,100); x=99 in [10,100); x=100 NOT (end exclusive);
        # x=250 in [240,260)
        assert got == {(0, 7), (1, 7), (3, 8)}
        # no duplicate pairs despite the ×10 interval replication
        assert len(rows) == len(got)

    def test_by_key_and_empty_interval(self, ray_session):
        left = pa.table(
            {
                "lid": pa.array([0, 1], pa.int64()),
                "u": pa.array([1, 2], pa.int64()),
                "x": pa.array([50, 50], pa.int64()),
            }
        )
        right = pa.table(
            {
                "rid": pa.array([7, 8, 9], pa.int64()),
                "ru": pa.array([1, 2, 1], pa.int64()),
                "s": pa.array([0, 0, 60], pa.int64()),
                "e": pa.array([100, 100, 60], pa.int64()),  # rid=9 empty
            }
        )
        rows = self._run(
            left,
            right,
            on="x",
            start_col="s",
            end_col="e",
            by="u",
            right_by="ru",
            granule=30,
        )
        got = {(r["lid"], r["rid"]) for r in rows}
        assert got == {(0, 7), (1, 8)}

    def test_partitioning_invariant(self, ray_session):
        import ray.data

        from overmatch_ray.stages.joins import interval_join

        rng = np.random.default_rng(3)
        n = 2000
        left = pa.table(
            {
                "lid": pa.array(np.arange(n, dtype=np.int64)),
                "u": pa.array(rng.integers(0, 20, n).astype(np.int64)),
                "x": pa.array(rng.integers(0, 10_000, n).astype(np.int64)),
            }
        )
        m = 300
        s = rng.integers(0, 10_000, m).astype(np.int64)
        right = pa.table(
            {
                "rid": pa.array(np.arange(m, dtype=np.int64)),
                "ru": pa.array(rng.integers(0, 20, m).astype(np.int64)),
                "s": pa.array(s),
                "e": pa.array(s + rng.integers(1, 500, m).astype(np.int64)),
            }
        )

        def run(nblocks, nb):
            rows = interval_join(
                ray.data.from_arrow(left).repartition(nblocks),
                ray.data.from_arrow(right).repartition(max(1, nblocks // 2)),
                on="x",
                start_col="s",
                end_col="e",
                by="u",
                right_by="ru",
                granule=256,
                num_buckets=nb,
            ).take_all()
            return sorted((r["lid"], r["rid"]) for r in rows)

        a = run(3, 16)
        assert a == run(9, 64)
        # brute-force reference
        lx = left.to_pandas()
        rx = right.to_pandas()
        ref = sorted(
            (int(l.lid), int(r.rid))
            for l in lx.itertuples()
            for r in rx.itertuples()
            if l.u == r.ru and r.s <= l.x < r.e
        )
        assert a == ref


class TestGlobalShuffle:
    def test_total_order_and_invariance(self, ray_session):
        import hashlib

        import ray.data

        from overmatch_ray.stages.splits import global_shuffle_rank

        n = 3000
        t = pa.table({"doc_id": pa.array(range(n), pa.int64())})

        def run(nblocks, nb):
            return {
                r["doc_id"]: r["shuffle_rank"]
                for r in global_shuffle_rank(
                    ray.data.from_arrow(t).repartition(nblocks),
                    "doc_id",
                    num_buckets=nb,
                ).take_all()
            }

        a = run(3, 16)
        assert run(11, 64) == a
        assert sorted(a.values()) == list(range(n)), "must be a permutation"
        order = sorted(range(n), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
        assert all(a[doc] == pos for pos, doc in enumerate(order))
        # salt produces a different permutation
        b = {
            r["doc_id"]: r["shuffle_rank"]
            for r in global_shuffle_rank(
                ray.data.from_arrow(t), "doc_id", salt="epoch2"
            ).take_all()
        }
        assert b != a and sorted(b.values()) == list(range(n))


class TestTermDocFreq:
    def test_cross_batch_sum(self, ray_session):
        import ray.data

        from overmatch_ray.stages.textstats import term_doc_freq

        t = pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(
                    ["a b a", "b c", "a", "c c c"]
                ),
            }
        )
        out = {
            r["word"]: r["sum(df_partial)"]
            for r in term_doc_freq(
                ray.data.from_arrow(t).repartition(4)
            ).take_all()
        }
        assert out == {"a": 2, "b": 2, "c": 2}


class TestCaptionConsistency:
    def test_groups_and_flags(self, ray_session):
        import ray.data

        from overmatch_ray.stages.images import caption_consistency

        t = pa.table(
            {
                "image_id": pa.array(["a", "b", "c", "d", "e", "f"]),
                "phash": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
                "caption": pa.array(
                    ["same cap", "same cap", "x", "y", "x", "solo"]
                ),
            }
        )
        rows = caption_consistency(
            ray.data.from_arrow(t).repartition(3)
        ).take_all()
        by_hash = {r["phash"]: r for r in rows}
        # phash 3 is a singleton → not a dup group at all
        assert set(by_hash) == {1, 2}
        assert by_hash[1]["consistent"] and by_hash[1]["n_captions"] == 1
        assert by_hash[1]["n_images"] == 2 and by_hash[1]["image_id"] == "a"
        assert not by_hash[2]["consistent"] and by_hash[2]["n_captions"] == 2
        assert by_hash[2]["n_images"] == 3 and by_hash[2]["image_id"] == "c"


class TestLmScore:
    def test_hand_computed(self, ray_session):
        import math

        import ray.data

        from overmatch_ray.stages.textstats import lm_score

        # corpus: 6 tokens total; tf: a=3, b=2, c=1
        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a b", "a b c"]),
            }
        )
        out = {
            r["doc_id"]: r["median_logprob"]
            for r in lm_score(ray.data.from_arrow(t).repartition(2)).take_all()
        }
        lp = {
            "a": math.log(3 / 6),
            "b": math.log(2 / 6),
            "c": math.log(1 / 6),
        }
        # doc0 tokens [a,a,b] → median = lp[a]; doc1 [a,b,c] → median = lp[b]
        assert out[0] == round(lp["a"], 6)
        assert out[1] == round(lp["b"], 6)


def _rand_emb(n, d=16, seed=5):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                rng.normal(size=(n, d)).tolist(), pa.list_(pa.float64())
            ),
        }
    )


class TestGraphAnn:
    def _brute(self, t, queries, k):
        from overmatch_ray.stages.knn import _normalize, _to_matrix

        m = _normalize(_to_matrix(t["embedding"]))
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        qm = _normalize(_to_matrix(queries["embedding"]))
        qids = queries["vec_id"].to_numpy(zero_copy_only=False)
        out = {}
        for qi in range(len(qids)):
            sims = m @ qm[qi]
            sims[ids == qids[qi]] = -np.inf
            order = np.lexsort((ids, -sims))[:k]
            out[int(qids[qi])] = set(ids[order].tolist())
        return out

    def test_full_beam_full_probe_equals_brute_force(self, ray_session):
        import ray.data

        from overmatch_ray.stages.graphann import build_nsw_index, nsw_topk
        from overmatch_ray.stages.knn import train_ivf_centroids

        t = _rand_emb(400)
        ds = ray.data.from_arrow(t).repartition(4)
        cents = train_ivf_centroids(ds, n_lists=4)
        index = build_nsw_index(ds, cents, M=6)
        q = t.slice(0, 8)
        rows = nsw_topk(
            index, q, cents, k=5, nprobe=4, ef=10_000
        ).take_all()
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        assert got == self._brute(t, q, 5)

    def test_recall_and_determinism(self, ray_session):
        import ray.data

        from overmatch_ray.stages.graphann import build_nsw_index, nsw_topk
        from overmatch_ray.stages.knn import train_ivf_centroids

        t = _rand_emb(1000, seed=9)
        q = t.slice(0, 20)
        brute = self._brute(t, q, 5)

        def run(nblocks, nb):
            ds = ray.data.from_arrow(t).repartition(nblocks)
            cents = train_ivf_centroids(ds, n_lists=8)
            index = build_nsw_index(ds, cents, M=8, num_buckets=nb)
            rows = nsw_topk(index, q, cents, k=5, nprobe=4, ef=64).take_all()
            return sorted(
                (r["query_id"], r["rank"], r["neighbor_id"]) for r in rows
            )

        a = run(3, 8)
        assert a == run(7, 32), "index+search must be partitioning-invariant"
        got = {}
        for qid, _, nid in a:
            got.setdefault(qid, set()).add(nid)
        hits = sum(len(got.get(qid, set()) & nb) for qid, nb in brute.items())
        recall = hits / (len(brute) * 5)
        assert recall >= 0.8, f"nsw recall {recall} too low"

    def test_ef_raises_reached_set(self, ray_session):
        """Within a fixed probed-list set, a larger beam must reach at
        least as good a candidate pool (recall monotone in ef)."""
        import ray.data

        from overmatch_ray.stages.graphann import build_nsw_index, nsw_topk
        from overmatch_ray.stages.knn import train_ivf_centroids

        t = _rand_emb(800, seed=11)
        q = t.slice(0, 10)
        ds = ray.data.from_arrow(t)
        cents = train_ivf_centroids(ds, n_lists=4)
        index = build_nsw_index(ds, cents, M=4).materialize()
        brute = self._brute(t, q, 5)

        def recall(ef):
            rows = nsw_topk(index, q, cents, k=5, nprobe=4, ef=ef).take_all()
            got = {}
            for r in rows:
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            return sum(
                len(got.get(qid, set()) & nb) for qid, nb in brute.items()
            ) / (len(brute) * 5)

        r_small, r_big = recall(8), recall(256)
        assert r_big >= r_small
        assert r_big >= 0.9, f"big-beam recall {r_big} too low"


class TestApproxDistinct:
    def test_accuracy_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import approx_distinct

        n, dup = 50_000, 4
        t = pa.table(
            {"k": pa.array(np.arange(n * dup, dtype=np.int64) % n)}
        )
        a = approx_distinct(ray.data.from_arrow(t).repartition(3), "k")
        b = approx_distinct(ray.data.from_arrow(t).repartition(17), "k")
        assert a == b, "register max is order-invariant → same estimate"
        assert abs(a - n) / n < 0.05, f"estimate {a} off from {n}"

    def test_small_range_linear_counting(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import approx_distinct

        t = pa.table({"k": pa.array(np.arange(150, dtype=np.int64))})
        est = approx_distinct(ray.data.from_arrow(t), "k")
        assert abs(est - 150) <= 3

    def test_string_keys(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import approx_distinct

        t = pa.table({"k": pa.array([f"user-{i%997}" for i in range(5000)])})
        est = approx_distinct(ray.data.from_arrow(t), "k")
        assert abs(est - 997) / 997 < 0.06


class TestApproxDistinctBy:
    """Grouped HyperLogLog (groupops.approx_distinct_by)."""

    def test_accuracy_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import approx_distinct_by

        # group A: 20k distinct, B: 3k distinct (x4 dup), C: 37 distinct
        g = ["A"] * 20_000 + ["B"] * 12_000 + ["C"] * 370
        v = (list(range(20_000)) + list(range(100_000, 103_000)) * 4
             + list(range(500_000, 500_037)) * 10)
        t = pa.table({"g": pa.array(g), "v": pa.array(np.array(v, np.int64))})
        truth = {"A": 20_000, "B": 3_000, "C": 37}
        prev = None
        for parts in (3, 17):
            out = approx_distinct_by(
                ray.data.from_arrow(t).repartition(parts), "g", "v"
            )
            got = dict(zip(out["g"].to_pylist(),
                           out["n_distinct_est"].to_pylist()))
            assert set(got) == set(truth)
            for grp, n in truth.items():
                assert abs(got[grp] - n) / n < 0.05, (grp, got[grp], n)
            if prev is not None:
                assert got == prev  # register max is order-invariant
            prev = got

    def test_single_group_matches_global(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import (
            approx_distinct,
            approx_distinct_by,
        )

        t = pa.table({
            "g": pa.array(["only"] * 5000),
            "v": pa.array([f"user-{i % 997}" for i in range(5000)]),
        })
        ds = ray.data.from_arrow(t)
        grouped = approx_distinct_by(ds, "g", "v")
        assert grouped["n_distinct_est"].to_pylist() == [
            approx_distinct(ds, "v")
        ]

    def test_nulls_excluded(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import approx_distinct_by

        t = pa.table({
            "g": pa.array(["x"] * 50 + [None] * 30),
            "v": pa.array(
                [float(i) for i in range(40)] + [None] * 10
                + [999.0] * 30
            ),
        })
        out = approx_distinct_by(ray.data.from_arrow(t), "g", "v")
        got = dict(zip(out["g"].to_pylist(), out["n_distinct_est"].to_pylist()))
        # null group rows gone entirely; null values in 'x' not counted
        assert set(got) == {"x"}
        assert abs(got["x"] - 40) <= 1


class TestHeavyHitters:
    """Two-pass Misra-Gries frequent items (stages.groupops.heavy_hitters):
    EXACT above ceil(N/denom), verified against a brute-force count."""

    @staticmethod
    def _skewed(n_hot=10, hot_count=2000, n_tail=40_000):
        # 10 hot items x2000 + 40k singletons: vocab (40_010) >> k (200),
        # so the MG compression path is genuinely exercised.
        items = np.concatenate(
            [np.repeat(np.arange(n_hot, dtype=np.int64), hot_count),
             np.arange(100_000, 100_000 + n_tail, dtype=np.int64)]
        )
        # deterministic interleave so hot items spread across batches
        order = np.argsort(items % 7919, kind="stable")
        return pa.table({"v": pa.array(items[order])})

    @staticmethod
    def _exact(t, denom):
        vals = t["v"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(vals, return_counts=True)
        thr = (len(vals) + denom - 1) // denom
        keep = cnt >= thr
        return {int(u): int(c) for u, c in zip(uniq[keep], cnt[keep])}

    def test_exact_vs_bruteforce_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import heavy_hitters

        t = self._skewed()
        want = self._exact(t, denom=100)
        assert len(want) == 10  # all hot, no tail
        for parts in (3, 17):
            out = heavy_hitters(
                ray.data.from_arrow(t).repartition(parts), "v", denom=100
            )
            got = dict(
                zip(out["item"].to_pylist(), out["cnt"].to_pylist())
            )
            assert got == want, f"parts={parts}"

    def test_threshold_boundary(self, ray_session):
        """Items exactly at / one below ceil(N/denom) are kept / dropped."""
        import ray.data

        from overmatch_ray.stages.groupops import heavy_hitters

        # N = 1000, denom = 10 -> threshold 100 exactly
        items = np.concatenate(
            [np.repeat(1, 100), np.repeat(2, 99),
             np.arange(1000, 1801, dtype=np.int64)]
        )
        t = pa.table({"v": pa.array(items.astype(np.int64))})
        assert len(t) == 1000
        out = heavy_hitters(ray.data.from_arrow(t).repartition(5), "v",
                            denom=10, k=40)
        got = dict(zip(out["item"].to_pylist(), out["cnt"].to_pylist()))
        assert got == {1: 100}

    def test_string_items_and_nulls(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import heavy_hitters

        vals = (["spam"] * 50 + ["ham"] * 30 + [None] * 20
                + [f"t{i}" for i in range(120)])
        t = pa.table({"v": pa.array(vals, pa.string())})
        # N (non-null) = 200, denom 8 -> threshold 25
        out = heavy_hitters(ray.data.from_arrow(t).repartition(4), "v",
                            denom=8, k=32)
        got = dict(zip(out["item"].to_pylist(), out["cnt"].to_pylist()))
        assert got == {"spam": 50, "ham": 30}
        assert out.schema.field("item").type == pa.string()

    def test_empty_input_typed_empty(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import heavy_hitters

        t = pa.table({"v": pa.array([], pa.int64())})
        out = heavy_hitters(ray.data.from_arrow(t), "v", denom=10)
        assert len(out) == 0
        assert out.schema.field("item").type == pa.int64()
        assert out.schema.field("cnt").type == pa.int64()

    def test_token_variant_matches_python(self, ray_session):
        import collections

        import ray.data

        from overmatch_ray.stages.groupops import heavy_hitter_tokens

        texts = [
            " ".join(f"w{(i * 31 + j) % 23}" for j in range(1 + i % 9))
            for i in range(400)
        ] + [None]
        toks = collections.Counter(
            tok for s in texts if s is not None for tok in s.split(" ")
        )
        n = sum(toks.values())
        denom = 30
        thr = (n + denom - 1) // denom
        want = {k: v for k, v in toks.items() if v >= thr}
        assert want  # nontrivial
        ds = ray.data.from_arrow(
            pa.table({"text": pa.array(texts, pa.string())})
        ).repartition(6)
        out = heavy_hitter_tokens(ds, "text", denom=denom)
        got = dict(zip(out["item"].to_pylist(), out["cnt"].to_pylist()))
        assert got == want

    def test_k_validation(self, ray_session):
        import pytest

        from overmatch_ray.stages.groupops import heavy_hitters

        with pytest.raises(ValueError):
            heavy_hitters(None, "v", denom=100, k=50)


class TestGroupedHeavyHitters:
    """Per-group exact frequent items (groupops.grouped_heavy_hitters)."""

    @staticmethod
    def _corpus():
        # group A: 2 hot (x800, x500) + 8k singleton tail
        # group B: 1 hot (x300) + 2k singleton tail; different hot skew
        # group C: tiny group, everything above its threshold
        g, v = [], []
        g += ["A"] * (800 + 500 + 8000)
        v += [1] * 800 + [2] * 500 + list(range(10_000, 18_000))
        g += ["B"] * (300 + 2000)
        v += [7] * 300 + list(range(50_000, 52_000))
        g += ["C"] * 12
        v += [9] * 7 + [11] * 5
        items = np.array(v, dtype=np.int64)
        grps = np.array(g)
        order = np.argsort((items * 2654435761) % 7919, kind="stable")
        return pa.table({"g": pa.array(grps[order]),
                         "v": pa.array(items[order])})

    @staticmethod
    def _exact(t, denom):
        import collections

        per = collections.defaultdict(collections.Counter)
        for g, v in zip(t["g"].to_pylist(), t["v"].to_pylist()):
            if g is not None and v is not None:
                per[g][v] += 1
        out = {}
        for g, c in per.items():
            n = sum(c.values())
            thr = (n + denom - 1) // denom
            for item, cnt in c.items():
                if cnt >= thr:
                    out[(g, item)] = cnt
        return out

    def test_exact_vs_bruteforce_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import grouped_heavy_hitters

        t = self._corpus()
        want = self._exact(t, denom=50)
        # groups have different thresholds: C's tiny N keeps everything
        assert ("C", 9) in want and ("C", 11) in want
        assert ("A", 1) in want and ("B", 7) in want
        for parts in (3, 13):
            out = grouped_heavy_hitters(
                ray.data.from_arrow(t).repartition(parts), "g", "v", denom=50
            )
            got = {
                (g, i): c
                for g, i, c in zip(out["g"].to_pylist(),
                                   out["item"].to_pylist(),
                                   out["cnt"].to_pylist())
            }
            assert got == want, f"parts={parts}"

    def test_nulls_excluded_both_columns(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import grouped_heavy_hitters

        t = pa.table({
            "g": pa.array(["x"] * 40 + [None] * 10 + ["x"] * 10),
            "v": pa.array([1] * 40 + [1] * 10 + [None] * 10, pa.int64()),
        })
        # valid rows: 40 of (x,1); N_x=40, denom 4 -> thr 10
        out = grouped_heavy_hitters(ray.data.from_arrow(t), "g", "v",
                                    denom=4, k=16)
        got = {(g, i): c for g, i, c in zip(out["g"].to_pylist(),
                                            out["item"].to_pylist(),
                                            out["cnt"].to_pylist())}
        assert got == {("x", 1): 40}

    def test_empty_typed(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import grouped_heavy_hitters

        t = pa.table({"g": pa.array([], pa.string()),
                      "v": pa.array([], pa.int64())})
        out = grouped_heavy_hitters(ray.data.from_arrow(t), "g", "v")
        assert len(out) == 0
        assert out.schema.field("g").type == pa.string()
        assert out.schema.field("item").type == pa.int64()


class TestTrainingExportComposition:
    def test_pack_then_resumable_shard_sink(self, ray_session, tmp_path):
        """End-to-end training export: token counts → pack_sequences shard
        assignment → resumable shard-partitioned parquet sink; a rerun
        skips completed shards, and the read-back equals the assignment."""
        import ray.data

        from overmatch_ray.state.checkpoint import (
            read_partitioned,
            write_partitioned_resumable,
        )
        from overmatch_ray.stages.splits import pack_sequences

        rng = np.random.default_rng(21)
        n = 1200
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "n_tokens": pa.array(
                    rng.integers(1, 300, n).astype(np.int64)
                ),
            }
        )
        packed = pack_sequences(
            ray.data.from_arrow(t), "doc_id", "n_tokens", budget=4096
        )
        out = str(tmp_path / "shards")
        scheme = "pack_sequences:budget=4096:v1"
        receipts = write_partitioned_resumable(
            packed, out, "shard_id", scheme=scheme
        ).take_all()
        n_shards = len(receipts)
        assert n_shards >= 2
        # rerun: everything already complete → zero new receipts
        again = write_partitioned_resumable(
            pack_sequences(
                ray.data.from_arrow(t), "doc_id", "n_tokens", budget=4096
            ),
            out,
            "shard_id",
            scheme=scheme,
        ).take_all()
        assert again == []
        back = {
            r["doc_id"]: r["shard_id"]
            for r in read_partitioned(out).take_all()
        }
        w = t["n_tokens"].to_numpy(zero_copy_only=False)
        expect = (np.cumsum(w) - w) // 4096
        assert back == {i: int(e) for i, e in enumerate(expect)}


class TestEdgeCases:
    def test_caption_consistency_no_dups(self, ray_session):
        import ray.data

        from overmatch_ray.stages.images import caption_consistency

        t = pa.table(
            {
                "image_id": pa.array(["a", "b"]),
                "phash": pa.array([1, 2], pa.int64()),
                "caption": pa.array(["x", "y"]),
            }
        )
        assert caption_consistency(ray.data.from_arrow(t)).take_all() == []

    def test_interval_join_empty_right(self, ray_session):
        import ray.data

        from overmatch_ray.stages.joins import interval_join

        left = pa.table(
            {"lid": pa.array([1], pa.int64()), "x": pa.array([5], pa.int64())}
        )
        right = pa.table(
            {
                "rid": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "e": pa.array([], pa.int64()),
            }
        )
        out = interval_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="x",
            start_col="s",
            end_col="e",
            granule=10,
        ).take_all()
        assert out == []

    def test_interval_join_date32(self, ray_session):
        import datetime as dt

        import ray.data

        from overmatch_ray.stages.joins import interval_join

        left = pa.table(
            {
                "lid": pa.array([1, 2], pa.int64()),
                "x": pa.array([dt.date(2024, 1, 15), dt.date(2024, 3, 1)]),
            }
        )
        right = pa.table(
            {
                "rid": pa.array([7], pa.int64()),
                "s": pa.array([dt.date(2024, 1, 1)]),
                "e": pa.array([dt.date(2024, 2, 1)]),
            }
        )
        out = interval_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            on="x",
            start_col="s",
            end_col="e",
            granule=31,
        ).take_all()
        assert [(r["lid"], r["rid"]) for r in out] == [(1, 7)]


class TestExactCorr:
    def test_matches_numpy_and_partition_invariant(self, ray_session):
        import ray.data

        from overmatch_ray.stages.groupops import exact_corr

        rng = np.random.RandomState(3)
        x = rng.randint(0, 1000, 20_000).astype(np.int64)
        # cent-scale y correlated with x: Σy² ≈ 2e19 — overflows int64,
        # which is exactly why the partials sum in Python ints
        y = (x * 31_000 + rng.randint(0, 20_000_000, 20_000)).astype(np.int64)
        t = pa.table({"x": pa.array(x), "y": pa.array(y)})
        assert float(y.astype(object).dot(y.astype(object))) > 2**63
        expected = np.corrcoef(x.astype(float), y.astype(float))[0, 1]
        prev = None
        for parts in (2, 13):
            n, c = exact_corr(ray.data.from_arrow(t).repartition(parts), "x", "y")
            assert n == 20_000
            assert c == pytest.approx(expected, abs=1e-12)
            if prev is not None:
                assert c == prev  # bit-identical across partitionings
            prev = c

    def test_degenerate_returns_nan(self, ray_session):
        import math

        import ray.data

        from overmatch_ray.stages.groupops import exact_corr

        t = pa.table({"x": pa.array([5, 5, 5], pa.int64()),
                      "y": pa.array([1, 2, 3], pa.int64())})
        n, c = exact_corr(ray.data.from_arrow(t), "x", "y")
        assert n == 3 and math.isnan(c)


class TestWeightedSample:
    def test_inclusion_proportional_to_weight_and_invariance(self, ray_session):
        import hashlib

        import numpy as np
        import pandas as pd
        import ray

        from overmatch_ray.stages.splits import weighted_sample_topk

        n = 4000
        df = pd.DataFrame({
            "id": np.arange(n),
            # two weight classes, 10:1
            "w": np.where(np.arange(n) % 2 == 0, 100, 10),
        })

        def direct(k):
            u = np.array([
                int(hashlib.md5(f"s:{i}".encode()).hexdigest()[:8], 16)
                for i in df["id"]], dtype=np.float64)
            pri = np.log((u + 1) / 4294967296.0) / df["w"].to_numpy()
            order = np.lexsort((df["id"].to_numpy(), -pri))
            return set(df["id"].to_numpy()[order[:k]])

        want = direct(400)
        for nblocks in (1, 9):
            ds = ray.data.from_pandas(df).repartition(nblocks)
            got = weighted_sample_topk(ds, "id", "w", k=400, salt="s:")
            ids = set(got.to_pandas()["id"])
            assert ids == want, nblocks
        # heavy class should dominate the sample ~10:1
        heavy = sum(1 for i in want if i % 2 == 0)
        assert heavy > 300

    def test_zero_weight_rows_never_sampled(self, ray_session):
        import numpy as np
        import pandas as pd
        import ray

        from overmatch_ray.stages.splits import weighted_sample_topk

        df = pd.DataFrame({"id": np.arange(10), "w": [0] * 8 + [5, 5]})
        got = weighted_sample_topk(
            ray.data.from_pandas(df), "id", "w", k=5).to_pandas()
        assert set(got["id"]) == {8, 9}


class TestBpeTrain:
    @staticmethod
    def _reference_bpe(texts, n_merges, min_freq=1):
        # plain single-process BPE (Sennrich-style), independent code path
        from collections import Counter

        vocab = Counter()
        for t in texts:
            for w in t.split(" "):
                if w:
                    vocab[w] += 1
        words = {w: list(w) for w in vocab}
        merges = []
        for _ in range(n_merges):
            pc_ = Counter()
            for w, syms in words.items():
                for a, b in zip(syms[:-1], syms[1:]):
                    pc_[(a, b)] += vocab[w]
            if not pc_:
                break
            best = min(pc_.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < min_freq:
                break
            (a, b), c = best
            merges.append((a, b, c))
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        return merges

    def test_matches_reference_and_partition_invariant(self, ray_session):
        import pandas as pd
        import ray

        from overmatch_ray.stages.textstats import bpe_train

        texts = [
            "the cat sat on the mat",
            "the dog sat on the log",
            "a cat and a dog and a log",
            "mat dog cat log the the",
        ] * 5
        want = self._reference_bpe(texts, 8)
        for nblocks in (1, 5):
            ds = ray.data.from_pandas(
                pd.DataFrame({"text": texts})).repartition(nblocks)
            got = bpe_train(ds, "text", n_merges=8).to_pandas()
            assert [
                (l, r, c) for l, r, c in zip(
                    got["left"], got["right"], got["pair_count"])
            ] == want, nblocks

    def test_min_freq_stops_early(self, ray_session):
        import pandas as pd
        import ray

        from overmatch_ray.stages.textstats import bpe_train

        ds = ray.data.from_pandas(pd.DataFrame({"text": ["ab cd"]}))
        got = bpe_train(ds, "text", n_merges=5, min_freq=2).to_pandas()
        assert len(got) == 0


class TestHybridSearch:
    def test_fusion_matches_component_retrievers(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from overmatch_ray.pipelines.rows_only import q_hybrid_search
        from overmatch_ray.sources import read_parquet_clean
        from overmatch_ray.stages.knn import brute_force_topk
        from overmatch_ray.stages.textstats import bm25_topk

        sf = "/root/testdata/sf0.001"
        got = q_hybrid_search(sf).to_pandas()
        assert len(got) == 10
        assert (np.diff(got["rrf_score"].to_numpy()) <= 1e-12).all()

        docs = read_parquet_clean(
            f"{sf}/documents.parquet", columns=["doc_id", "text"])
        lex = bm25_topk(docs, ["hash", "join", "scan"], k=20).to_pandas()
        emb = read_parquet_clean(
            f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
        probe = pa.concat_tables([
            pa.table(b) for b in emb.filter(expr="vec_id == 0").iter_batches(
                batch_format="pyarrow")])
        sem = brute_force_topk(emb, probe, k=20).to_pandas()
        score = {}
        for rank, did in enumerate(lex["doc_id"], start=1):
            score[int(did)] = score.get(int(did), 0.0) + 1 / (60 + rank)
        for rank, did in zip(sem["rank"], sem["neighbor_id"]):
            score[int(did)] = score.get(int(did), 0.0) + 1 / (60 + int(rank))
        want = sorted(score, key=lambda d: (-score[d], d))[:10]
        assert list(got["doc_id"]) == want


class TestBpeEncode:
    def test_counts_match_single_process_apply(self, ray_session):
        import pandas as pd
        import ray

        from overmatch_ray.stages.textstats import (
            _apply_merges,
            bpe_encode,
            bpe_train,
        )

        texts = [
            "the cat sat on the mat",
            "the dog sat on the log",
            "a cat and a dog and a log",
            "mat dog cat log the the",
            "",
        ] * 4
        ids = list(range(len(texts)))
        ds = ray.data.from_pandas(
            pd.DataFrame({"doc_id": ids, "text": texts})
        ).repartition(4)
        merges = bpe_train(ds, "text", n_merges=8)
        ranks = {
            (le, ri): rk
            for rk, le, ri in zip(
                merges["rank"].to_pylist(),
                merges["left"].to_pylist(),
                merges["right"].to_pylist(),
            )
        }
        got = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in bpe_encode(ds, "text", "doc_id", merges).take_all()
        }
        for i, t in zip(ids, texts):
            want = sum(
                len(_apply_merges(list(w), ranks))
                for w in t.split(" ") if w
            )
            assert got[i] == want, (i, t)

    def test_encode_partition_invariant(self, ray_session):
        import pandas as pd
        import ray

        from overmatch_ray.stages.textstats import bpe_encode, bpe_train

        texts = ["aa ab ba bb ab aa", "ba ba ab", "aa aa aa aa"] * 6
        ids = list(range(len(texts)))

        def run(nblocks):
            ds = ray.data.from_pandas(
                pd.DataFrame({"doc_id": ids, "text": texts})
            ).repartition(nblocks)
            merges = bpe_train(ds, "text", n_merges=4)
            return sorted(
                (r["doc_id"], r["n_bpe_tokens"])
                for r in bpe_encode(ds, "text", "doc_id", merges).take_all()
            )

        assert run(1) == run(6)


class TestChunkDocuments:
    def test_windows_cover_and_overlap(self, ray_session):
        """Every token index is covered; consecutive chunks overlap by
        size-stride tokens; reconstruction from stride-prefixes equals the
        original text (the RAG-chunking invariants)."""
        from overmatch_ray.pipelines.corpus_queries import (
            _CHUNK_SIZE,
            _CHUNK_STRIDE,
            q_chunk_documents,
        )

        out = q_chunk_documents("/root/testdata/sf0.001")
        rows = sorted(
            out.take_all(), key=lambda r: (r["doc_id"], r["chunk_idx"])
        )
        assert rows, "no chunks produced"
        import pyarrow.parquet as pq

        texts = {
            r["doc_id"]: r["text"]
            for r in pq.read_table(
                "/root/testdata/sf0.001/documents.parquet",
                columns=["doc_id", "text"],
            ).to_pylist()
        }
        by_doc: dict = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert set(by_doc) == set(texts)
        for did, chs in by_doc.items():
            toks = texts[did].split(" ")
            # chunk_idx are 0..n-1 dense
            assert [c["chunk_idx"] for c in chs] == list(range(len(chs)))
            for c in chs:
                start = c["chunk_idx"] * _CHUNK_STRIDE
                want = toks[start:start + _CHUNK_SIZE]
                assert c["chunk_text"] == " ".join(want)
                assert c["n_tokens"] == len(want)
            # stride-prefix reconstruction: first STRIDE tokens of every
            # chunk plus the final chunk's tail reassemble the document
            rebuilt: list = []
            for c in chs[:-1]:
                rebuilt.extend(c["chunk_text"].split(" ")[:_CHUNK_STRIDE])
            rebuilt.extend(chs[-1]["chunk_text"].split(" "))
            assert rebuilt == toks


class TestProfileColumns:
    def test_null_counting_and_all_null_block(self, ray_session):
        """n_nulls must count Arrow nulls across blocks, and an all-null
        block must not poison min/max (the lineitem_profile oracle can
        only ever validate n_nulls=0 — TPC-H carries no nulls)."""
        import ray.data

        from overmatch_ray.stages.groupops import profile_columns

        t = pa.table(
            {
                "a": pa.array([1.0, None, 3.0, None, 5.0, None, None, 8.0]),
                "b": pa.array([None, None, None, None] + [2.0, 4.0, 6.0, 0.5]),
            }
        )
        # 4 blocks of 2 rows — the first "b" blocks are ALL null
        ds = ray.data.from_arrow(t).repartition(4)
        rows = {r["column_name"]: r for r in
                profile_columns(ds, ["a", "b"]).take_all()}
        assert rows["a"]["n_rows"] == 8 and rows["a"]["n_nulls"] == 4
        assert rows["a"]["min_v"] == 1.0 and rows["a"]["max_v"] == 8.0
        assert rows["b"]["n_rows"] == 8 and rows["b"]["n_nulls"] == 4
        assert rows["b"]["min_v"] == 0.5 and rows["b"]["max_v"] == 6.0


class TestAssociationPairs:
    def test_matches_bruteforce_and_invariance(self, ray_session):
        import itertools

        import numpy as np
        import ray.data

        from overmatch_ray.stages.groupops import association_pairs

        rng = np.random.default_rng(21)
        rows = []
        for basket in range(300):
            items = rng.choice(40, size=rng.integers(1, 6), replace=False)
            for it in items:
                rows.append((basket, int(it)))
                if rng.random() < 0.1:
                    rows.append((basket, int(it)))  # duplicate line
        t = pa.table({
            "b": pa.array([r[0] for r in rows], pa.int64()),
            "i": pa.array([r[1] for r in rows], pa.int64()),
        })

        # brute force with the same rounding + ordering rule
        baskets = {}
        for b, i in rows:
            baskets.setdefault(b, set()).add(i)
        nb = len(baskets)
        marg, pair = {}, {}
        for b, items in baskets.items():
            for i in items:
                marg[i] = marg.get(i, 0) + 1
            for a, c in itertools.combinations(sorted(items), 2):
                pair[(a, c)] = pair.get((a, c), 0) + 1
        scored = [
            (a, c, s, round(float(nb) * s / (marg[a] * marg[c]), 6))
            for (a, c), s in pair.items() if s >= 2
        ]
        want = sorted(scored, key=lambda r: (-r[3], r[0], r[1]))[:50]

        def got(nblocks):
            return [
                (r["item_a"], r["item_b"], r["support"], r["lift"])
                for r in association_pairs(
                    ray.data.from_arrow(t).repartition(nblocks),
                    "b", "i", min_support=2, k=50,
                ).take_all()
            ]

        a = got(2)
        assert a == want
        assert got(7) == a, "partitioning must not matter"


class TestDocKeywords:
    def test_hand_computed_and_partition_invariance(self, ray_session):
        import math

        import ray.data

        from overmatch_ray.stages.textstats import doc_keywords

        # 4 docs; 'apple' in 1 doc, 'pear' in 2, 'the' in all 4
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "the apple apple pear",
                "the pear kiwi",
                "the kiwi kiwi kiwi",
                "the",
            ]),
        })
        n = 4
        dfs = {"the": 4, "apple": 1, "pear": 2, "kiwi": 2}
        tfs = {
            1: {"the": 1, "apple": 2, "pear": 1},
            2: {"the": 1, "pear": 1, "kiwi": 1},
            3: {"the": 1, "kiwi": 3},
            4: {"the": 1},
        }
        want = []
        for d, tf in tfs.items():
            scored = sorted(
                ((round(c * math.log(n / dfs[w]), 6), w, c)
                 for w, c in tf.items()),
                key=lambda t: (-t[0], t[1]),
            )
            for r, (s, w, c) in enumerate(scored[:3], 1):
                want.append((d, w, c, s, r))
        want.sort()

        for blocks in (1, 3):
            out = doc_keywords(
                ray.data.from_arrow(docs).repartition(blocks),
                k=3, num_buckets=4,
            ).to_pandas()
            got = sorted(
                (int(r.doc_id), r.word, int(r.tf), float(r.score),
                 int(r.rank))
                for r in out.itertuples()
            )
            assert got == want
        # 'the' appears in every doc → idf 0 → never outranks real terms
        assert ("1", "the") not in {(d, w) for d, w, *_ in want[:3]}


class TestZipfFit:
    def test_vs_direct_numpy_and_partition_invariance(self, ray_session):
        import ray.data

        from overmatch_ray.stages.textstats import zipf_fit

        docs = pa.table({
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "text": pa.array([
                "a a a a b b c",
                "a a b c d d",
                "a b e",
                "a a a c",
                "b d e e",
                "a",
            ]),
        })
        # direct reference: full sort by (tf DESC, word), quantized OLS
        from collections import Counter

        tf = Counter()
        for t in docs["text"].to_pylist():
            tf.update(t.split(" "))
        ranked = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
        x = [int(np.floor(1e6 * np.log(float(r))))
             for r in range(1, len(ranked) + 1)]
        y = [int(np.floor(1e6 * np.log(float(c)))) for _w, c in ranked]
        n = len(x)
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        sxy = sum(a * b for a, b in zip(x, y))
        slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        want = (n, round(slope, 6), round(intercept, 6))

        for blocks in (1, 3):
            out = zipf_fit(
                ray.data.from_arrow(docs).repartition(blocks)
            ).to_pandas()
            got = (int(out.n_words[0]), float(out.slope[0]),
                   float(out.intercept[0]))
            assert got == want
        assert want[1] < 0  # frequency falls with rank
