"""Learned BPE token counts (pipeline/bpe.py).

Public algorithm: Sennrich et al. 2016 subword BPE — vocabulary-based
training (one corpus groupBy + bounded driver loop), chained-replace
application (pure JVM string expressions)."""

import pytest
import pyspark.sql.functions as F

from tempo_spark.pipeline.bpe import BPEModel, train_bpe


class TestTrainBpe:
    def test_learns_frequent_pairs_in_order(self, spark):
        df = spark.createDataFrame(
            [(0, "low lower lowest low low"), (1, "new newer newest new")],
            "doc_id long, text string",
        )
        m = train_bpe(df, num_merges=6)
        # greedy most-frequent-first: (l,o) count 5 leads; ties broken
        # by (count DESC, left ASC, right ASC)
        assert m.merges[0] == ("l", "o")
        assert m.merges[1] == ("lo", "w")

    def test_python_model_parity(self, spark):
        """Training over the vocab must equal a brute-force reference BPE
        over the raw word stream (overlap pair counts, non-overlapping
        left-to-right merge application)."""
        texts = [
            "aba aba cab abacab bc bc bc",
            "deed deed dee ed",
            "aba deed cab",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        m = train_bpe(df, num_merges=5)

        # reference model
        words = [w for t in texts for w in t.split()]
        segs = {w: list(w) for w in set(words)}
        counts = {w: words.count(w) for w in set(words)}
        merges = []
        for _ in range(5):
            pc = {}
            for w, toks in segs.items():
                for a, b in zip(toks, toks[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + counts[w]
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < 2:
                break
            a, b = best[0]
            merges.append((a, b))
            for w, toks in segs.items():
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                segs[w] = out
        assert m.merges == merges

        got = {
            r.doc_id: r.n_bpe_tokens
            for r in m.token_count(df).collect()
        }
        want = {
            i: sum(len(segs[w]) for w in t.split())
            for i, t in enumerate(texts)
        }
        assert got == want

    def test_nonoverlapping_left_to_right(self, spark):
        df = spark.createDataFrame([(0, "aaaa aaa")], "doc_id long, text string")
        m = BPEModel([("a", "a")])
        rows = m.with_segments(df).collect()
        # 'aaaa' -> aa aa; 'aaa' -> aa a (leftmost-first, non-overlapping)
        assert rows[0].bpe_pieces == ["aa", "aa", "aa", "a"]
        cnt = m.token_count(df).collect()[0].n_bpe_tokens
        assert cnt == 4

    def test_merges_never_cross_whitespace(self, spark):
        df = spark.createDataFrame([(0, "ab a b")], "doc_id long, text string")
        m = BPEModel([("a", "b")])
        rows = m.with_segments(df).collect()
        assert rows[0].bpe_pieces == ["ab", "a", "b"]

    def test_null_empty_and_unseen_words(self, spark):
        train = spark.createDataFrame(
            [(0, "xy xy xy zz zz")], "doc_id long, text string"
        )
        m = train_bpe(train, num_merges=2)
        assert ("x", "y") in m.merges
        apply_df = spark.createDataFrame(
            [(0, None), (1, ""), (2, "   "), (3, "xyxy qqq")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.n_bpe_tokens for r in m.token_count(apply_df).collect()}
        # unseen word 'xyxy' still segments exactly (xy xy), 'qqq' chars
        assert got == {0: None, 1: 0, 2: 0, 3: 2 + 3}

    def test_max_vocab_cap_and_stop(self, spark):
        df = spark.createDataFrame(
            [(0, "aa aa aa bb bb cc")], "doc_id long, text string"
        )
        # cap keeps top-1 word ('aa' count 3) only -> merges learn from it
        m = train_bpe(df, num_merges=8, max_vocab=1)
        assert m.merges == [("a", "a")]  # then stops: no pair count >= 2
        with pytest.raises(ValueError, match="max_vocab"):
            train_bpe(df, max_vocab=0)
        with pytest.raises(ValueError, match="num_merges"):
            train_bpe(df, num_merges=-1)

    def test_save_load_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(0, "low lower low low")], "doc_id long, text string"
        )
        m = train_bpe(df, num_merges=3)
        p = str(tmp_path / "bpe_model")
        m.save(spark, p)
        m2 = BPEModel.load(spark, p)
        assert m2.merges == m.merges

    def test_output_column_guard(self, spark):
        df = spark.createDataFrame([(0, "a b", 1)], "doc_id long, text string, n_bpe_tokens int")
        with pytest.raises(ValueError, match="n_bpe_tokens"):
            BPEModel([]).token_count(df)

    def test_incremental_trainer_matches_naive_recount(self, spark):
        """r10: the heap/incremental trainer must produce the exact merge
        sequence of a naive full-recount loop at depth (200 merges over a
        random corpus — ties, cascaded merges, dried-up pairs all hit)."""
        import random

        rng = random.Random(11)
        texts = [
            " ".join(
                "".join(rng.choice("abcde") for _ in range(rng.randint(1, 10)))
                for _ in range(rng.randint(1, 15))
            )
            for _ in range(120)
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        m = train_bpe(df, num_merges=200)

        # naive reference: full recount each round on bracketed strings
        from tempo_spark.pipeline.bpe import SC, SO

        words: dict = {}
        for t in texts:
            for w in t.split():
                words[w] = words.get(w, 0) + 1
        vocab = [(SO + (SC + SO).join(w) + SC, c) for w, c in words.items()]
        naive = []
        for _ in range(200):
            counts: dict = {}
            for s, c in vocab:
                toks = s[1:-1].split(SC + SO)
                for p in zip(toks, toks[1:]):
                    counts[p] = counts.get(p, 0) + c
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < 2:
                break
            a, b = best[0]
            naive.append((a, b))
            pat, rep = f"{SO}{a}{SC}{SO}{b}{SC}", f"{SO}{a}{b}{SC}"
            vocab = [(s.replace(pat, rep), c) for s, c in vocab]
        assert m.merges == naive

    def test_arrow_engine_parity(self, spark):
        """The Arrow (rank-loop, distinct-word-cached) engine must equal
        the chained-replace expression engine bit-for-bit — including on
        texts where merges cascade (a merge output feeding a later merge)
        and on null/empty/sentinel-polluted rows."""
        import random

        rng = random.Random(7)
        alpha = "abcd"
        texts = [
            " ".join(
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
                for _ in range(rng.randint(0, 12))
            )
            for _ in range(60)
        ] + [None, "", "  ", "\x02ab\x03cd", "aaaaaaa bbbb abab",
             "ab ab", "ab ab"]  # unicode spaces are TOKEN chars
             # in Java \S (ASCII-only) — both engines must agree
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        m = train_bpe(df, num_merges=12)
        assert len(m.merges) > 0
        expr = {
            r.doc_id: r.n_bpe_tokens
            for r in m.token_count(df, engine="expr").collect()
        }
        arrow = {
            r.doc_id: r.n_bpe_tokens
            for r in m.token_count(df, engine="arrow").collect()
        }
        assert expr == arrow

    def test_auto_engine_flips_past_budget(self, spark, monkeypatch):
        from tempo_spark.pipeline import bpe as bpe_mod

        df = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
        m = BPEModel([("a", "b")])
        monkeypatch.setattr(bpe_mod, "REPLACE_CHAIN_MAX", 0)
        out = m.token_count(df)  # auto -> arrow
        assert out.collect()[0].n_bpe_tokens == 2
        with pytest.raises(ValueError, match="REPLACE_CHAIN_MAX"):
            m.with_segments(df)
        with pytest.raises(ValueError, match="engine"):
            m.token_count(df, engine="nope")

    def test_streaming_composes(self, spark, tmp_path):
        """token_count is pure per-row string expressions — must run
        unchanged on a streaming frame."""
        d = str(tmp_path / "docs")
        spark.createDataFrame(
            [(0, "low low lower")], "doc_id long, text string"
        ).write.parquet(d)
        m = BPEModel([("l", "o"), ("lo", "w")])
        stream = spark.readStream.schema("doc_id long, text string").parquet(d)
        out = m.token_count(stream)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName("bpe_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        rows = spark.table("bpe_stream").collect()
        batch = m.token_count(
            spark.read.parquet(d)
        ).collect()
        # 'low' + 'low' + 'low e r' = 5 pieces
        assert rows[0].n_bpe_tokens == batch[0].n_bpe_tokens == 5


class TestTokenIds:
    def test_encode_ids_scheme_and_unk(self, spark):
        train = spark.createDataFrame(
            [(0, "ab ab ab cd cd")], "doc_id long, text string"
        )
        m = train_bpe(train, num_merges=2)
        # vocab: <unk>=0, then sorted base chars, then merges in order
        v = m.vocab()
        assert v[0] == "<unk>"
        assert v[1:5] == ["a", "b", "c", "d"]
        assert "ab" in v and "cd" in v
        apply_df = spark.createDataFrame(
            [(0, "ab cd"), (1, None), (2, "ab xq")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.token_ids for r in m.encode_ids(apply_df).collect()}
        vid = {p: i for i, p in enumerate(v)}
        assert got[0] == [vid["ab"], vid["cd"]]
        assert got[1] is None
        # chars outside the training alphabet -> <unk>=0
        assert got[2] == [vid["ab"], 0, 0]
        # ids length equals token_count per doc
        n = {
            r.doc_id: r.n_bpe_tokens for r in m.token_count(apply_df).collect()
        }
        for d, ids in got.items():
            assert (ids is None) == (n[d] is None)
            if ids is not None:
                assert len(ids) == n[d]

    def test_ids_roundtrip_and_missing_base(self, spark, tmp_path):
        train = spark.createDataFrame(
            [(0, "low lower low")], "doc_id long, text string"
        )
        m = train_bpe(train, num_merges=3)
        p = str(tmp_path / "bpe_ids_model")
        m.save(spark, p)
        m2 = BPEModel.load(spark, p)
        assert m2.merges == m.merges and m2.base_chars == m.base_chars
        assert m2.vocab() == m.vocab()
        bare = BPEModel(m.merges)  # no alphabet -> ids unavailable
        import pytest as _pytest

        with _pytest.raises(ValueError, match="base alphabet"):
            bare.vocab()
        df = spark.createDataFrame([(0, "x", [1])],
                                   "doc_id long, text string, token_ids array<int>")
        with _pytest.raises(ValueError, match="token_ids"):
            m.encode_ids(df)

    def test_empty_alphabet_roundtrips_as_trained(self, spark, tmp_path):
        """r10 review: an empty base alphabet (degenerate corpus) is a
        real trained state — vocab is just <unk>, and save/load keeps it
        distinct from a legacy no-alphabet model."""
        train = spark.createDataFrame(
            [(0, None), (1, "   ")], "doc_id long, text string"
        )
        m = train_bpe(train, num_merges=2)
        assert m.base_chars == [] and m.vocab() == ["<unk>"]
        p = str(tmp_path / "bpe_empty")
        m.save(spark, p)
        m2 = BPEModel.load(spark, p)
        assert m2.base_chars == [] and m2.vocab() == ["<unk>"]

    def test_duplicate_merged_string_keeps_first_id(self, spark):
        # (a,bc) and (ab,c) both produce 'abc' — one id, first occurrence
        m = BPEModel([("b", "c"), ("a", "bc"), ("a", "b"), ("ab", "c")],
                     base_chars=["a", "b", "c"])
        v = m.vocab()
        assert v.count("abc") == 1


class TestByteLevel:
    def _df(self, spark):
        rows = [(i, t) for i, t in enumerate([
            "hello hello world",
            "hello würld",
            "naïve café ☕ test",
            "",
            None,
            "hello\tworld\x0bagain",
            "aaa aaa aaab",
        ])]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_trains_over_bytes_and_counts(self, spark):
        from tempo_spark.pipeline.bpe import _hex_tokens, train_bpe

        df = self._df(spark)
        m = train_bpe(df, "text", num_merges=10, level="byte")
        assert m.level == "byte"
        # merges are hex-pair tokens
        assert all(
            set(a + b) <= set("0123456789ABCDEF") for a, b in m.merges
        )
        got = {
            r.doc_id: r.n
            for r in m.token_count(df, "text", out="n", engine="expr").collect()
        }
        arrow = {
            r.doc_id: r.n
            for r in m.token_count(df, "text", out="n", engine="arrow").collect()
        }
        assert got == arrow
        # python replay of the rank loop over utf-8 bytes
        import re

        enc = m._word_encoder()
        ws = re.compile(r"[ \t\n\x0b\f\r]+")

        def pycount(t):
            if t is None:
                return None
            clean = t.replace("\x02", "").replace("\x03", "")
            return sum(len(enc(w)) for w in ws.split(clean) if w)

        for r_id, t in enumerate(
            ["hello hello world", "hello würld", "naïve café ☕ test", "",
             None, "hello\tworld\x0bagain", "aaa aaa aaab"]
        ):
            assert got[r_id] == pycount(t)
        # multi-byte chars really segment at byte grain: before any merge
        # '☕' is 3 byte tokens
        assert _hex_tokens("☕") == ["E2", "98", "95"]

    def test_no_unk_ever_and_id_scheme(self, spark):
        from tempo_spark.pipeline.bpe import train_bpe

        df = self._df(spark)
        m = train_bpe(df, "text", num_merges=6, level="byte")
        v = m.vocab()
        assert v[0] == "<unk>" and v[1:257] == [f"{i:02X}" for i in range(256)]
        # a doc full of NEVER-SEEN bytes still encodes without unk
        probe = spark.createDataFrame(
            [(0, "ZZZ 你好 \x7f")], "doc_id long, text string"
        )
        ids = m.encode_ids(probe, "text").collect()[0].token_ids
        assert ids and 0 not in ids

    def test_byte_save_load_and_pre_r11_default(self, spark, tmp_path):
        from tempo_spark.pipeline.bpe import BPEModel, train_bpe

        df = self._df(spark)
        m = train_bpe(df, "text", num_merges=5, level="byte")
        p = str(tmp_path / "bm")
        m.save(spark, p)
        m2 = BPEModel.load(spark, p)
        assert m2.level == "byte" and m2.merges == m.merges
        assert m2.base_chars == m.base_chars
        # char-level models round-trip their level too
        mc = train_bpe(df, "text", num_merges=3)
        pc = str(tmp_path / "cm")
        mc.save(spark, pc)
        assert BPEModel.load(spark, pc).level == "char"
        # a legacy table without the level row defaults to char
        spark.createDataFrame(
            [(0, "a", "b", "merge")],
            "idx int, left string, right string, kind string",
        ).write.mode("overwrite").parquet(str(tmp_path / "legacy"))
        legacy = BPEModel.load(spark, str(tmp_path / "legacy"))
        assert legacy.level == "char" and legacy.merges == [("a", "b")]

    def test_level_validation(self, spark):
        import pytest

        from tempo_spark.pipeline.bpe import BPEModel, train_bpe

        with pytest.raises(ValueError, match="level"):
            BPEModel([], level="word")
        with pytest.raises(ValueError, match="level"):
            train_bpe(self._df(spark), "text", num_merges=1, level="words")
