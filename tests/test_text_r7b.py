"""Brute-force pins for the late-round-7 text/dedup additions:
``text_bpe_merges`` (BPE first-merge pair statistics) and
``dedup_containment_pairs`` (asymmetric subset-duplicate containment)."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq


def _docs(sf_dir, cols=("doc_id", "text")):
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=list(cols)).to_pylist()


class TestBpeMerges:
    def test_matches_bruteforce(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.queries.text import text_bpe_merges

        got = [(r.pair, r.merge_count) for r in text_bpe_merges(spark, sf_dir).collect()]

        vocab = Counter()
        for d in _docs(sf_dir):
            for w in d["text"].lower().split(" "):
                if len(w) >= 2:
                    vocab[w] += 1
        pairs = Counter()
        for w, f in vocab.items():
            for i in range(len(w) - 1):
                pairs[w[i : i + 2]] += f
        want = sorted(pairs.items(), key=lambda t: (-t[1], t[0]))[:20]
        assert got == want

    def test_rank_order_is_total(self, spark, sf_dir):
        """(count desc, pair asc) has no ties left unresolved — the
        LIMIT 20 boundary is deterministic across engines/runs."""
        from go_nats_to_clickhouse_spark.queries.text import text_bpe_merges

        rows = text_bpe_merges(spark, sf_dir).collect()
        keys = [(-r.merge_count, r.pair) for r in rows]
        assert keys == sorted(keys) and len(set(keys)) == len(keys)


class TestContainmentPairs:
    @staticmethod
    def _shingle_sets(sf_dir):
        sets = {}
        for d in _docs(sf_dir):
            ws = d["text"].split(" ")
            if len(ws) >= 3:
                sets[d["doc_id"]] = {
                    " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
                }
        return sets

    def test_matches_bruteforce(self, spark, sf_dir):
        from go_nats_to_clickhouse_spark.queries.text import (
            dedup_containment_pairs,
        )

        got = {
            (r.contained_doc, r.container_doc): (r.containment, r.jaccard)
            for r in dedup_containment_pairs(spark, sf_dir).collect()
        }

        sets = self._shingle_sets(sf_dir)
        # replicate the df<=64 flood guard on the JOIN side only (the
        # containment denominator stays uncapped by design)
        df = Counter()
        for s in sets.values():
            for sh in s:
                df[sh] += 1
        capped = {d: {sh for sh in s if df[sh] <= 64} for d, s in sets.items()}

        want = {}
        ids = sorted(sets)
        for a in ids:
            for b in ids:
                if a == b:
                    continue
                n_common = len(capped[a] & capped[b])
                if not n_common:
                    continue
                cont = n_common / len(sets[a])
                if cont >= 0.8:
                    jac = n_common / (len(sets[a]) + len(sets[b]) - n_common)
                    want[(a, b)] = (round(cont, 6), round(jac, 6))
        assert got == want
        assert want, "fixture should contain at least one containment pair"

    def test_asymmetry_is_represented(self, spark, sf_dir):
        """Containment is directional: whenever |sh(A)| != |sh(B)| for an
        emitted pair, the two directions disagree — pin that at least the
        scores are internally consistent (containment >= jaccard always;
        equality only when the pair is a mutual near-identical)."""
        from go_nats_to_clickhouse_spark.queries.text import (
            dedup_containment_pairs,
        )

        for r in dedup_containment_pairs(spark, sf_dir).collect():
            assert r.containment >= r.jaccard - 1e-9


class TestMatryoshkaTopk:
    def test_matches_bruteforce(self, spark, sf_dir):
        import math

        import pyarrow.parquet as pq_

        from go_nats_to_clickhouse_spark.queries.vector import (
            _MRL_DIM,
            vector_matryoshka_topk,
        )

        vecs = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in pq_.read_table(
                f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
            ).to_pylist()
        }

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            return num / (
                math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
            )

        def topk(d):
            out = {}
            for qid in [v for v in vecs if v < 8]:
                scored = sorted(
                    (
                        (-cos(vecs[qid][:d], vecs[nid][:d]), nid)
                        for nid in vecs
                        if nid != qid
                    ),
                )[:10]
                out[qid] = [nid for _, nid in scored]
            return out

        t, f = topk(_MRL_DIM), topk(64)
        got = [
            (r.query_id, r.neighbor_id, r.rank, r.in_full_topk)
            for r in vector_matryoshka_topk(spark, sf_dir).collect()
        ]
        want = [
            (qid, nid, i + 1, nid in f[qid])
            for qid in sorted(t)
            for i, nid in enumerate(t[qid])
        ]
        assert got == want
        # the audit must be non-degenerate on the fixtures: truncation
        # keeps SOME of the full top-10 and loses SOME
        flags = [g[3] for g in got]
        assert any(flags) and not all(flags)
