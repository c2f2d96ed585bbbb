"""BPE merge learning vs a pure-Python Sennrich reference."""

from collections import Counter

from telemetry_streaming_datalake_spark.operators import text as TX
from telemetry_streaming_datalake_spark.session import load_table

SF = "/root/testdata/sf0.001"


def _python_bpe(word_freq: dict, n_merges: int):
    """Reference implementation: overlapping adjacent-pair counts,
    argmax with (count desc, left, right) tie-break, greedy
    left-to-right non-overlapping replacement."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    out = []
    for rank in range(n_merges):
        stats = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += f
        if not stats:
            break
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, a, b, a + b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return out


def _word_freq(spark):
    import re

    docs = load_table(spark, SF, "documents").select("text").collect()
    wf = Counter()
    for r in docs:
        norm = re.sub(r"\s+", " ", r.text).strip().lower()
        for w in norm.split(" "):
            if w:
                wf[w] += 1
    return dict(wf)


def test_bpe_merges_match_python_reference(spark):
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in TX.bpe_merges(load_table(spark, SF, "documents"), n_merges=6)
        .orderBy("merge_rank")
        .collect()
    ]
    want = _python_bpe(_word_freq(spark), 6)
    assert got == want


def test_bpe_learns_multi_char_merges(spark):
    """Later merges must build on earlier ones (a merged symbol appears
    on the left or right of a subsequent rule) on this corpus."""
    rules = TX.bpe_merges(load_table(spark, SF, "documents"), n_merges=8).collect()
    assert len(rules) == 8
    merged_syms = {r.merged for r in rules}
    assert any(
        (r.left in merged_syms or r.right in merged_syms)
        for r in rules
        if r.merge_rank > 0
    )


def test_bpe_empty_corpus(spark):
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    assert TX.bpe_merges(docs, n_merges=3).count() == 0


def test_bpe_max_vocab_caps_iteration_frame(spark):
    """With the cap at 1 the trainer sees only the most frequent word;
    its merges must equal the Python reference over that word alone."""
    docs = spark.createDataFrame(
        [(0, "aa aa aa bb", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in TX.bpe_merges(docs, n_merges=2, max_vocab=1)
        .orderBy("merge_rank")
        .collect()
    ]
    # only "aa" (freq 3) survives the cap; one merge (a,a) then done
    assert got == [(0, "a", "a", "aa", 3)]


def _python_segment(word_freq: dict, merges: list):
    """Apply learned merges rank-by-rank (greedy left-to-right) —
    returns word → token count."""
    vocab = {w: list(w) for w in word_freq}
    for _rank, a, b, _m, _cnt in merges:
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return {w: len(s) for w, s in vocab.items()}


def test_tokenize_bpe_matches_python_reference(spark):
    """Per-doc BPE token counts must equal learn-then-apply with the
    pure-Python Sennrich reference."""
    import re
    from collections import Counter

    docs = load_table(spark, SF, "documents")
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in TX.tokenize_bpe(docs, n_merges=6).collect()
    }
    wf = _word_freq(spark)
    merges = _python_bpe(wf, 6)
    seg = _python_segment(wf, merges)
    rows = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    for r in rows:
        norm = re.sub(r"\s+", " ", r.text).strip().lower()
        words = [w for w in norm.split(" ") if w]
        if not words:
            assert r.doc_id not in got
            continue
        assert got[r.doc_id] == (len(words), sum(seg[w] for w in words)), r.doc_id


def test_tokenize_bpe_oov_fallback_under_vocab_cap(spark):
    """With max_vocab capping the trainer, out-of-vocab words must
    count as character segmentation, not drop."""
    docs = spark.createDataFrame(
        [(0, "aa aa aa zzz"), (1, "zzz")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_bpe_tokens for r in TX.tokenize_bpe(docs, n_merges=1, max_vocab=1).collect()}
    # vocab = {aa}; merge (a,a)->aa => aa = 1 token; zzz OOV = 3 chars
    assert out[0] == 1 * 3 + 3
    assert out[1] == 3


def test_tokenize_bpe_surfaces_oov_share(spark):
    """The char-fallback approximation is visible: n_oov_words and
    oov_token_share quantify how much of the count is fallback
    (ADVICE r6 — no silent divergence from reference tokenizer
    application)."""
    docs = spark.createDataFrame(
        [(0, "aa aa aa zzz"), (1, "zzz")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in TX.tokenize_bpe(docs, n_merges=1, max_vocab=1).collect()}
    assert out[0].n_oov_words == 1 and out[1].n_oov_words == 1
    # doc 0: 3 in-vocab tokens (aa×3→1 each) + 3 fallback chars = 6
    assert out[0].oov_token_share == 0.5
    assert out[1].oov_token_share == 1.0
    full = TX.tokenize_bpe(docs, n_merges=1).collect()
    assert all(r.n_oov_words == 0 and r.oov_token_share == 0.0 for r in full)


def test_tokenize_fixed_vocab_matches_python_application(spark):
    """The shipped-vocab tokenizer must equal rank-ordered greedy
    application of FIXED_BPE_MERGES in pure Python."""
    import re

    docs = load_table(spark, SF, "documents")
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in TX.tokenize_fixed_vocab(docs).collect()
    }
    wf = _word_freq(spark)
    rules = [(None, a, b, a + b, None) for a, b in TX.FIXED_BPE_MERGES]
    seg = _python_segment(wf, rules)
    for r in docs.select("doc_id", "text").collect():
        norm = re.sub(r"\s+", " ", r.text).strip().lower()
        words = [w for w in norm.split(" ") if w]
        if not words:
            assert r.doc_id not in got
            continue
        assert got[r.doc_id] == (len(words), sum(seg[w] for w in words)), r.doc_id
