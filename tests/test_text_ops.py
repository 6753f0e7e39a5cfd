"""Property tests for the corpus-shaping text operators added late in
round 3 — invariants the DuckDB oracles can't express (the oracles prove
cross-engine parity; these prove the operators mean what they claim)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gisaid_pipeline_functions_spark.operators.text import (
    gopher_rules,
    pii_mask,
    unigram_logprob,
    vocab_coverage,
    repetition_metrics,
    winnowing_fingerprints,
)
from gisaid_pipeline_functions_spark.operators.training import (
    hex_uniform_u32,
    weighted_sample_k_per_group,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


class TestWinnowing:
    def test_shared_run_guarantee(self, spark):
        # THE winnowing property (Schleimer et al. §3): any shared run of
        # >= k+w-1 = 6 words forces at least one shared fingerprint —
        # regardless of what surrounds the run in either document.
        shared = "alpha beta gamma delta epsilon zeta"  # 6 words
        docs = _docs(
            spark,
            [
                f"one two three {shared} four five",
                f"{shared} completely different tail here",
            ],
        )
        fp = winnowing_fingerprints(docs, "doc_id", "text", k=3, w=4)
        per_doc = {
            r["doc_id"]: set(r["fps"])
            for r in fp.groupBy("doc_id")
            .agg(F.collect_set("fingerprint").alias("fps"))
            .collect()
        }
        assert per_doc[0] & per_doc[1], "shared 6-word run must share a fingerprint"

    def test_short_doc_emits_whole_array_min(self, spark):
        # fewer than w grams -> exactly one fingerprint (the global min);
        # fewer than k words -> no grams, no rows
        docs = _docs(spark, ["a b c d", "a b"])
        fp = winnowing_fingerprints(docs, "doc_id", "text", k=3, w=4)
        rows = fp.collect()
        assert {r["doc_id"] for r in rows} == {0}
        assert len([r for r in rows if r["doc_id"] == 0]) == 1

    def test_fingerprints_subset_of_gram_hashes(self, spark):
        docs = _docs(spark, ["w1 w2 w3 w4 w5 w6 w7 w8"])
        fp = {r["fingerprint"] for r in winnowing_fingerprints(
            docs, "doc_id", "text", k=3, w=4).collect()}
        grams = {
            r["h"]
            for r in docs.select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(F.split("text", " ")) - 2),
                        lambda i: F.md5(
                            F.concat_ws(
                                " ",
                                F.element_at(F.split(F.col("text"), " "), i.cast("int")),
                                F.element_at(F.split(F.col("text"), " "), (i + 1).cast("int")),
                                F.element_at(F.split(F.col("text"), " "), (i + 2).cast("int")),
                            )
                        ),
                    )
                ).alias("h")
            ).collect()
        }
        assert fp and fp <= grams


class TestRepetition:
    def test_pure_repetition_saturates(self, spark):
        n = 12
        docs = _docs(spark, [" ".join(["spam"] * n)])
        r = repetition_metrics(docs, "doc_id", "text").collect()[0]
        assert r["n_tokens"] == n
        assert r["dup_word_frac"] == round(1 - 1 / n, 6)
        assert r["top_2gram_frac"] == 1.0  # every 2-gram is the modal one
        assert r["keep"] is False

    def test_all_distinct_passes(self, spark):
        docs = _docs(spark, [" ".join(f"w{i}" for i in range(20))])
        r = repetition_metrics(docs, "doc_id", "text").collect()[0]
        assert r["dup_word_frac"] == 0.0
        assert r["top_2gram_frac"] == round(1 / 19, 6)
        assert r["keep"] is True

    def test_modal_gram_count_matches_groupby(self, spark):
        # the map-side sorted-run fold must agree with the explode+groupBy
        # mode on a text with a non-trivial modal gram
        text = "a b a b a b c d c d x"
        docs = _docs(spark, [text])
        r = repetition_metrics(docs, "doc_id", "text").collect()[0]
        words = text.split()
        grams = [f"{words[i]} {words[i+1]}" for i in range(len(words) - 1)]
        top = max(grams.count(g) for g in set(grams))
        assert r["top_2gram_frac"] == round(top / len(grams), 6)


class TestPiiMask:
    def test_masks_and_counts(self, spark):
        docs = _docs(
            spark,
            ["reach me at bob.smith@mail.example or 555-01234 thanks",
             "no pii here at all"],
        )
        out = {r["doc_id"]: r for r in pii_mask(docs, "doc_id", "text").collect()}
        assert out[0]["n_emails"] == 1 and out[0]["n_phones"] == 1
        assert out[1]["n_emails"] == 0 and out[1]["n_phones"] == 0
        # masked text must not hash like the original
        raw_md5 = docs.filter(F.col("doc_id") == 0).select(
            F.md5("text")).collect()[0][0]
        assert out[0]["masked_md5"] != raw_md5
        assert out[1]["masked_md5"] == docs.filter(
            F.col("doc_id") == 1).select(F.md5("text")).collect()[0][0]


class TestWeightedReservoir:
    def test_exact_k_and_determinism(self, spark):
        rows = [
            Row(doc_id=i, grp="g" + str(i % 2), w=(i % 5) + 1)
            for i in range(40)
        ]
        df = spark.createDataFrame(rows)
        out1 = weighted_sample_k_per_group(df, "grp", "doc_id", "w", 3)
        got1 = sorted((r["grp"], r["doc_id"], r["rk"]) for r in out1.collect())
        # repartitioning must not change the sample (map-side keys)
        out2 = weighted_sample_k_per_group(
            df.repartition(7, "doc_id"), "grp", "doc_id", "w", 3
        )
        got2 = sorted((r["grp"], r["doc_id"], r["rk"]) for r in out2.collect())
        assert got1 == got2
        assert len(got1) == 6 and {g for g, _, _ in got1} == {"g0", "g1"}

    def test_u32_range(self, spark):
        df = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
        stats = df.select(hex_uniform_u32(F.col("doc_id")).alias("v")).agg(
            F.min("v").alias("lo"), F.max("v").alias("hi")
        ).collect()[0]
        assert 0 <= stats["lo"] and stats["hi"] < 2**32


class TestGopherRules:
    def test_empty_and_short_docs(self, spark):
        docs = _docs(spark, ["", "ok go", "the a of and to in is " * 10])
        out = {
            r["doc_id"]: r
            for r in gopher_rules(docs, "doc_id", "text", min_words=3).collect()
        }
        assert out[0]["n_words"] == 0 and not out[0]["pass_gopher"]
        assert out[0]["mean_word_len"] == 0.0
        assert out[1]["n_words"] == 2 and not out[1]["rule_word_count"]
        # all-stopword doc: passes stopword rule, fails mean-word-length
        assert out[2]["rule_stopwords"]
        assert out[2]["mean_word_len"] < 3.0 and not out[2]["rule_mean_word_len"]

    def test_pass_is_conjunction(self, spark):
        docs = _docs(spark, ["the cat sat on a mat with the dog near it"])
        r = gopher_rules(docs, "doc_id", "text", min_words=5).collect()[0]
        assert r["pass_gopher"] == (
            r["rule_word_count"]
            and r["rule_mean_word_len"]
            and r["rule_alpha_words"]
            and r["rule_stopwords"]
        )


class TestUnigramLogprob:
    def test_hand_corpus(self, spark):
        import math

        docs = _docs(spark, ["a a b", "b"])
        out = {
            r["doc_id"]: r for r in unigram_logprob(docs, "doc_id", "text").collect()
        }
        # corpus counts: a=2, b=2, total=4 -> p(a)=p(b)=0.5
        nlp = -math.log(0.5)
        assert out[0]["n_tokens"] == 3
        assert abs(out[0]["mean_neg_logprob"] - round(nlp, 6)) < 1e-6
        assert abs(out[1]["perplexity"] - round(math.exp(nlp), 6)) < 1e-6

    def test_zero_word_docs_drop_out(self, spark):
        docs = _docs(spark, ["", "hello world"])
        ids = {r["doc_id"] for r in unigram_logprob(docs, "doc_id", "text").collect()}
        assert ids == {1}


class TestVocabCoverage:
    def test_oov_rate(self, spark):
        # 'x' appears 3 times, everything else once -> vocab_size=1 = {x}
        docs = _docs(spark, ["x x y", "x z"])
        out = {
            r["doc_id"]: r
            for r in vocab_coverage(docs, "doc_id", "text", vocab_size=1).collect()
        }
        assert out[0]["n_oov"] == 1 and abs(out[0]["oov_rate"] - 1 / 3) < 1e-5
        assert out[1]["n_oov"] == 1 and out[1]["oov_rate"] == 0.5

    def test_vocab_via_take_ordered_not_global_window(self, spark):
        # scale guard: the top-V selection must plan as a distributed
        # TakeOrderedAndProject, never a single-partition window
        docs = _docs(spark, ["a b c d e f g h"] * 3)
        plan = vocab_coverage(docs, "doc_id", "text", vocab_size=2)._jdf.queryExecution().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan


class TestSemDeDup:
    def test_identical_vectors_drop_higher_id(self, spark):
        from gisaid_pipeline_functions_spark.operators.similarity import semdedup

        rows = [
            Row(vec_id=0, embedding=[1.0, 0.0]),
            Row(vec_id=1, embedding=[1.0, 0.0]),   # dup of 0
            Row(vec_id=2, embedding=[0.0, 1.0]),
            Row(vec_id=3, embedding=[0.0, 0.9]),   # near-dup of 2
        ]
        out = {
            r["vec_id"]: r["kept"]
            for r in semdedup(
                spark.createDataFrame(rows), k=2, iterations=1, threshold=0.9
            ).collect()
        }
        assert out == {0: True, 1: False, 2: True, 3: False}

    def test_no_forced_broadcast_of_drops(self, spark):
        # the drop-set anti-pattern from VERDICT r4: the kept-join must not
        # carry a user broadcast hint (AQE may still CHOOSE broadcast)
        import ast
        import inspect
        import textwrap

        from gisaid_pipeline_functions_spark.operators import similarity

        tree = ast.parse(textwrap.dedent(inspect.getsource(similarity.semdedup)))
        calls = [
            n.func.attr if isinstance(n.func, ast.Attribute) else getattr(n.func, "id", "")
            for n in ast.walk(tree)
            if isinstance(n, ast.Call)
        ]
        assert "broadcast" not in calls


class TestFuzzAgainstPythonReference:
    """Seeded random-corpus cross-check: the Column-expression operators
    must agree with straightforward pure-Python reimplementations on
    inputs uglier than the testdata (empty docs, repeated words, unicode
    punctuation, single chars). One Spark job per operator."""

    def _fuzz_docs(self):
        import random

        rng = random.Random(20260814)
        alphabet = ["the", "a", "of", "zz", "q", "##", "12", "λ", "word",
                    "longishword", "x" * 30, ""]
        docs = []
        for i in range(120):
            n = rng.randint(0, 12)
            docs.append(" ".join(rng.choice(alphabet) for _ in range(n)))
        docs += ["", " ", "  ", "the the the", "λ λ λ"]
        return docs

    def test_gopher_rules_fuzz(self, spark):
        import re

        texts = self._fuzz_docs()
        out = {
            r["doc_id"]: r
            for r in gopher_rules(
                _docs(spark, texts), "doc_id", "text", min_words=3, max_words=8
            ).collect()
        }
        stop = {"the", "a", "of", "and", "to", "in", "is"}
        for i, t in enumerate(texts):
            w = [x for x in t.split(" ") if x]
            n = len(w)
            mwl = sum(len(x) for x in w) / n if n else 0.0
            af = sum(1 for x in w if re.search("[a-zA-Z]", x)) / n if n else 0.0
            ns = len({x.lower() for x in w} & stop)
            r = out[i]
            assert r["n_words"] == n, (i, t)
            assert abs(r["mean_word_len"] - round(mwl, 6)) < 1e-6, (i, t)
            assert abs(r["alpha_word_frac"] - round(af, 6)) < 1e-6, (i, t)
            assert r["n_distinct_stopwords"] == ns, (i, t)
            assert r["rule_word_count"] == (3 <= n <= 8), (i, t)
            assert r["pass_gopher"] == (
                (3 <= n <= 8) and (3.0 <= mwl <= 10.0) and af >= 0.8 and ns >= 2
            ), (i, t)

    def test_unigram_logprob_fuzz(self, spark):
        import collections
        import math

        texts = self._fuzz_docs()
        words_per_doc = {i: [x for x in t.split(" ") if x] for i, t in enumerate(texts)}
        freq = collections.Counter(w for ws in words_per_doc.values() for w in ws)
        total = sum(freq.values())
        out = {
            r["doc_id"]: r
            for r in unigram_logprob(_docs(spark, texts), "doc_id", "text").collect()
        }
        for i, ws in words_per_doc.items():
            if not ws:
                assert i not in out
                continue
            nlp = sum(-math.log(freq[w] / total) for w in ws) / len(ws)
            assert out[i]["n_tokens"] == len(ws)
            assert abs(out[i]["mean_neg_logprob"] - nlp) < 1e-5, (i, ws)

    def test_vocab_coverage_fuzz(self, spark):
        import collections

        texts = self._fuzz_docs()
        words_per_doc = {i: [x for x in t.split(" ") if x] for i, t in enumerate(texts)}
        freq = collections.Counter(w for ws in words_per_doc.values() for w in ws)
        vocab = {w for w, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:5]}
        out = {
            r["doc_id"]: r
            for r in vocab_coverage(
                _docs(spark, texts), "doc_id", "text", vocab_size=5
            ).collect()
        }
        for i, ws in words_per_doc.items():
            if not ws:
                assert i not in out
                continue
            oov = sum(1 for w in ws if w not in vocab)
            assert out[i]["n_oov"] == oov, (i, ws)


class TestSpanSurgery:
    """Semantics of span-level exact-substring dedup (Lee et al. 2022):
    the oracle proves cross-engine parity; these prove the cuts land on
    the right words."""

    def _run(self, spark, texts, k=3, min_run=2):
        from gisaid_pipeline_functions_spark.operators.dedup import span_surgery

        out = span_surgery(_docs(spark, texts), "doc_id", "text", k=k,
                           min_run=min_run)
        return {r["doc_id"]: r for r in out.collect()}

    def test_shared_span_cut_from_both_docs(self, spark):
        shared = "the quick brown fox jumps"
        rows = self._run(
            spark,
            [f"alpha {shared} omega", f"start {shared} end here now"],
        )
        # run of 3 dup 3-gram starts >= min_run=2 -> all 5 shared words go
        assert rows[0]["clean_text"] == "alpha omega"
        assert rows[1]["clean_text"] == "start end here now"
        assert rows[0]["n_spans"] == rows[1]["n_spans"] == 1
        assert rows[0]["n_removed_words"] == rows[1]["n_removed_words"] == 5

    def test_single_shingle_collision_survives_min_run(self, spark):
        # one isolated dup shingle (run length 1 < min_run 2) is noise,
        # not a span — both docs come back untouched
        rows = self._run(
            spark,
            ["aa bb cc xx yy zz", "aa bb cc pp qq rr"],
        )
        assert rows[0]["clean_text"] == "aa bb cc xx yy zz"
        assert rows[0]["n_spans"] == 0 and rows[0]["n_removed_words"] == 0

    def test_full_excision_yields_empty_text(self, spark):
        dup = "w1 w2 w3 w4 w5"
        rows = self._run(spark, [dup, dup])
        assert rows[0]["clean_text"] == "" and rows[1]["clean_text"] == ""
        assert rows[0]["n_removed_words"] == 5

    def test_overlapping_runs_do_not_double_count(self, spark):
        # two islands closer than k words: covered intervals overlap; the
        # per-position union must count each removed word once
        a = "s1 s2 s3 g1 s4 s5 s6"  # dup starts {0} and {4} with k=3
        rows = self._run(spark, [a, "x " + a + " y"], k=3, min_run=1)
        r = rows[0]
        assert r["n_removed_words"] <= 7
        assert r["clean_text"] == ""  # intervals [0,2] and [4,6] + the
        # bridging start at g1? no: 'g1 s4 s5' only in padded doc context
        # — recompute: doc0 shingles s1s2s3,s2s3g1,s3g1s4,g1s4s5,s4s5s6
        # all appear inside doc1's padded copy too -> every start dup ->
        # one island covering [0,6] -> everything removed

    def test_short_docs_pass_through(self, spark):
        rows = self._run(spark, ["one two", "one two"], k=3, min_run=1)
        assert rows[0]["clean_text"] == "one two"
        assert rows[0]["n_spans"] == 0


class TestClassifierScore:
    """The learned NB log-odds scorer must separate classes its weak
    labels define (the oracle proves engine parity; this proves the
    learning direction is right)."""

    def test_separates_weak_classes(self, spark):
        from gisaid_pipeline_functions_spark.operators.text import classifier_score

        good = [
            "the quick brown fox jumps over the lazy dog near the old river bank",
            "a steady rain fell over the quiet town as the evening train arrived",
        ]
        bad = ["x y z q", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb"]
        out = {
            r["doc_id"]: r
            for r in classifier_score(_docs(spark, good + bad)).collect()
        }
        assert out[0]["label_weak"] and out[1]["label_weak"]
        assert not out[2]["label_weak"] and not out[3]["label_weak"]
        # every good doc outscores every bad doc: the NB weights point
        # the same way as the labels they were trained from
        assert min(out[0]["score"], out[1]["score"]) > max(
            out[2]["score"], out[3]["score"]
        )

    def test_empty_docs_drop(self, spark):
        from gisaid_pipeline_functions_spark.operators.text import classifier_score

        out = classifier_score(
            _docs(spark, ["", "one two three four five six seven eight nine ten"])
        ).collect()
        assert [r["doc_id"] for r in out] == [1]


class TestBigramLogprob:
    def test_word_order_sensitivity_and_transition_count(self, spark):
        from gisaid_pipeline_functions_spark.operators.text import bigram_logprob

        common = "the cat sat on the mat"
        out = {
            r["doc_id"]: r
            for r in bigram_logprob(
                _docs(
                    spark,
                    [common, common, common, "mat the on sat cat the", "x"],
                )
            ).collect()
        }
        # 6 words -> 5 transitions; the single-word doc drops out
        assert out[0]["n_transitions"] == 5
        assert 4 not in out
        # the thrice-repeated doc's transitions are all frequent; the
        # reversed doc's transitions are mostly unique -> higher ppl
        assert out[0]["perplexity"] < out[3]["perplexity"]
        assert out[0]["mean_neg_logprob"] == out[1]["mean_neg_logprob"]


class TestLangidProfiles:
    def test_separable_labels_classify_correctly(self, spark):
        from pyspark.sql import Row

        from gisaid_pipeline_functions_spark.operators.text import (
            langid_ngram_profiles,
        )

        # two "languages" with disjoint character inventories: profiles
        # are fully separable, so every doc must classify correctly
        aa = ["aaa bbb aab bba abab", "abba baab aabb bbaa", "ab ba aab bab"]
        zz = ["zzz yyy zzy yyz zyzy", "zyyz yzzy zzyy yyzz", "zy yz zzy yzy"]
        rows = [Row(doc_id=i, text=t, lang="A") for i, t in enumerate(aa)]
        rows += [Row(doc_id=10 + i, text=t, lang="Z") for i, t in enumerate(zz)]
        out = langid_ngram_profiles(
            spark.createDataFrame(rows), profile_size=10, doc_ranks=10
        ).collect()
        assert len(out) == 6
        assert all(r["correct"] for r in out)
        assert {r["pred_lang"] for r in out} == {"A", "Z"}

    def test_short_docs_drop_and_ties_deterministic(self, spark):
        from pyspark.sql import Row

        from gisaid_pipeline_functions_spark.operators.text import (
            langid_ngram_profiles,
        )

        rows = [
            Row(doc_id=0, text="ab", lang="A"),       # < 3 chars: no grams
            Row(doc_id=1, text="same text", lang="A"),
            Row(doc_id=2, text="same text", lang="B"),
        ]
        out = {r["doc_id"]: r for r in langid_ngram_profiles(
            spark.createDataFrame(rows)).collect()}
        assert 0 not in out
        # identical docs under two labels: equal distance to both
        # profiles -> the (dist, label) tie-break picks 'A' for both
        assert out[1]["pred_lang"] == out[2]["pred_lang"] == "A"


class TestSpanSurgeryWithin:
    def test_internal_repeat_only_flagged_by_within_mode(self, spark):
        from gisaid_pipeline_functions_spark.operators.dedup import span_surgery

        # one doc repeats a 5-word span internally; no other doc shares it
        span = "p q r s t"
        doc = f"start {span} middle {span} end"
        other = "totally different words that never repeat anything at all"
        df = _docs(spark, [doc, other])
        cross = {r["doc_id"]: r for r in span_surgery(
            df, "doc_id", "text", k=3, min_run=2, cross_doc_only=True
        ).collect()}
        within = {r["doc_id"]: r for r in span_surgery(
            df, "doc_id", "text", k=3, min_run=2, cross_doc_only=False
        ).collect()}
        # cross-doc mode: internal repeats don't flag
        assert cross[0]["n_spans"] == 0
        assert cross[0]["clean_text"] == doc
        # within mode: both copies of the repeated span are excised
        assert within[0]["n_spans"] >= 1
        assert span not in within[0]["clean_text"]
        assert within[1]["n_spans"] == 0


class TestPmiCollocations:
    def test_known_corpus(self, spark):
        import math

        from gisaid_pipeline_functions_spark.operators.text import (
            pmi_collocations,
        )

        # "new york" always together (3 of each), "the cat" twice but
        # both words frequent elsewhere → PMI(new,york) > PMI(the,cat)
        docs = _docs(
            spark,
            [
                "new york is big",
                "i love new york",
                "new york again",
                "the cat sat",
                "the cat ran",
                "the dog sat",
                "the end the end",
            ],
        )
        out = {
            (r.w1, r.w2): r
            for r in pmi_collocations(docs, "text", min_count=2, k=100).collect()
        }
        assert ("new", "york") in out
        ny = out[("new", "york")]
        assert ny.pair_count == 3
        # hand-computed: T=24 tokens, B=17 bigrams, c(new)=c(york)=3
        expect = round(math.log2((3 / 17) / ((3 / 24) * (3 / 24))), 6)
        assert abs(ny.pmi - expect) < 1e-6
        assert ("the", "cat") in out
        assert ny.pmi > out[("the", "cat")].pmi

    def test_min_count_prunes(self, spark):
        from gisaid_pipeline_functions_spark.operators.text import (
            pmi_collocations,
        )

        docs = _docs(spark, ["alpha beta", "alpha beta", "gamma delta"])
        pairs = {
            (r.w1, r.w2)
            for r in pmi_collocations(docs, "text", min_count=2, k=10).collect()
        }
        assert pairs == {("alpha", "beta")}


class TestTextRank:
    def test_edges_filter_and_orient(self, spark):
        from gisaid_pipeline_functions_spark.operators.text import (
            textrank_edges,
        )

        docs = _docs(spark, ["Zebra apple ZEBRA cat apple", "ab cd apple"])
        # len>=4 lowercased: [zebra, apple, zebra, cat?] 'cat' len 3 → out;
        # doc1 candidates: zebra apple zebra apple → edges (apple,zebra)
        # doc2: only 'apple' survives → no pair
        edges = {(r.u, r.v) for r in textrank_edges(docs, "text", 4).collect()}
        assert edges == {("apple", "zebra")}

    def test_hub_word_ranks_first(self, spark):
        from gisaid_pipeline_functions_spark.operators.text import (
            textrank_keywords,
        )

        # star graph: 'spark' adjacent to 4 distinct words, which never
        # co-occur with each other → 'spark' gets the top score
        docs = _docs(
            spark,
            [
                "spark alpha",
                "spark betaa",
                "spark gamma",
                "spark delta",
            ],
        )
        top = textrank_keywords(docs, "text", iterations=5, k=10).collect()
        assert top[0].word == "spark"
        assert top[0].score > top[1].score


class TestKnHeldoutScore:
    def test_matches_python_reference(self, spark):
        from math import exp, log

        from gisaid_pipeline_functions_spark.operators.text import (
            kn_heldout_score,
        )

        train_texts = ["a b a c", "a b d", "b a"]
        held_texts = ["a b x", "x y"]  # unseen word x, fully-unseen context y
        train = _docs(spark, train_texts)
        held = spark.createDataFrame(
            [Row(doc_id=100 + i, text=t) for i, t in enumerate(held_texts)]
        )

        # plain-Python replay of the model
        bc: dict = {}
        for t in train_texts:
            ws = t.split()
            for a, b in zip(ws, ws[1:]):
                bc[(a, b)] = bc.get((a, b), 0) + 1
        cw: dict = {}
        n1f: dict = {}
        n1b: dict = {}
        for (a, b), c in bc.items():
            cw[a] = cw.get(a, 0) + c
            n1f[a] = n1f.get(a, 0) + 1
            n1b[b] = n1b.get(b, 0) + 1
        bt = len(bc)
        v = len({w for t in train_texts for w in t.split()})
        d = 0.75

        def p(a, b):
            pc = (n1b.get(b, 0) + 1.0) / (bt + v)
            if a not in cw:
                return pc
            return (max(bc.get((a, b), 0) - d, 0.0) + d * n1f[a] * pc) / cw[a]

        from decimal import ROUND_HALF_UP, Decimal

        def r6(x):  # Spark F.round semantics: shortest-repr HALF_UP
            return float(
                Decimal(repr(x)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )

        want = {}
        for i, t in enumerate(held_texts):
            ws = t.split()
            lats = [
                int(
                    Decimal(repr(-log(p(a, b)) * 1e6)).quantize(
                        Decimal("1"), rounding=ROUND_HALF_UP
                    )
                )
                for a, b in zip(ws, ws[1:])
            ]
            unseen = sum(1 for a, b in zip(ws, ws[1:]) if (a, b) not in bc)
            n = len(lats)
            me6 = (2 * sum(lats) + n) // (2 * n)  # integer half-up mean
            m = me6 / 1e6
            want[100 + i] = (n, unseen, m, r6(exp(m)))

        got = {
            r["doc_id"]: (
                r["n_transitions"],
                r["n_unseen_bigrams"],
                r["mean_neg_logprob"],
                r["perplexity"],
            )
            for r in kn_heldout_score(train, held).collect()
        }
        assert got == want

    def test_probabilities_stay_in_unit_interval(self, spark, sf_dir):
        # P <= 1 by construction (discounted + redistributed mass <= c(w1*))
        # => mean_neg_logprob >= 0 even with every bigram unseen
        from gisaid_pipeline_functions_spark.operators.text import (
            kn_heldout_score,
        )
        from gisaid_pipeline_functions_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        out = kn_heldout_score(
            docs.filter("doc_id % 5 != 0"), docs.filter("doc_id % 5 = 0")
        ).collect()
        assert len(out) > 0
        assert all(r["mean_neg_logprob"] >= 0.0 for r in out)
        assert all(r["perplexity"] >= 1.0 for r in out)
        # the sf0.001 synthetic corpus happens to have zero unseen
        # held-out bigrams (tiny vocab); the unseen path is pinned by
        # test_matches_python_reference's hand fixture instead
        assert all(r["n_unseen_bigrams"] >= 0 for r in out)


class TestExactSubstrChars:
    def test_50_char_match_cut_49_not(self, spark):
        from gisaid_pipeline_functions_spark.operators.dedup import (
            exactsubstr_chars,
        )

        shared50 = "x" * 11 + "the quick brown fox jumps over the lazy dog"[:39]
        assert len(shared50) == 50
        shared49 = shared50[:49]
        # boundary chars differ per doc (0/1/2) so the maximal shared
        # runs are EXACTLY shared50 / shared49 — no incidental extension
        # through common adjacent spaces
        texts = [
            "AAA0" + shared50 + "0BBB",
            "CCC1" + shared50 + "1DDD",
            "EEE2" + shared49 + "2FFF",  # partner below threshold
            "unrelated text with no duplication at all here",
        ]
        out = {
            r["doc_id"]: r
            for r in exactsubstr_chars(
                _docs(spark, texts), "doc_id", "text", k=25, w=8, min_run=26
            ).collect()
        }
        assert out[0]["n_spans"] == 1 and out[1]["n_spans"] == 1
        assert out[0]["n_removed_chars"] == 50  # exactly-at-threshold cut
        assert shared50 not in out[0]["clean_text"]
        assert out[0]["clean_text"] == "AAA00BBB"
        # doc 2 shares only 49 chars with docs 0/1 -> 25 dup positions
        # < min_run=26 -> untouched
        assert out[2]["n_spans"] == 0
        assert out[2]["clean_text"] == texts[2]
        assert out[3]["clean_text"] == texts[3]
        spark.catalog.clearCache()

    def test_prefilter_equals_unfiltered_on_corpus(self, spark, sf_dir):
        # the winnowing-anchor restriction sheds only uncuttable docs on
        # the test corpus: identical output with and without it
        from gisaid_pipeline_functions_spark.operators.dedup import (
            exactsubstr_chars,
        )
        from gisaid_pipeline_functions_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents")
        fast = {
            r["doc_id"]: tuple(r)
            for r in exactsubstr_chars(
                docs, "doc_id", "text", prefilter=True
            ).collect()
        }
        full = {
            r["doc_id"]: tuple(r)
            for r in exactsubstr_chars(
                docs, "doc_id", "text", prefilter=False
            ).collect()
        }
        assert fast == full
        assert any(r[2] > 0 for r in fast.values())  # some doc was cut
        spark.catalog.clearCache()

    def test_w_above_min_run_rejected(self, spark):
        from gisaid_pipeline_functions_spark.operators.dedup import (
            exactsubstr_chars,
        )

        with pytest.raises(ValueError):
            exactsubstr_chars(
                _docs(spark, ["a"]), "doc_id", "text", w=30, min_run=26
            )
