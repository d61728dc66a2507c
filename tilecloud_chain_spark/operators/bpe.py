"""Merge-table byte-pair encoding (training-data pipeline extension;
upgrades the ceil(len/4) subword ESTIMATE in ``operators.text`` to a real
trained-vocabulary tokenizer).

Public-knowledge algorithm (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): train = repeatedly merge
the most frequent adjacent symbol pair over a word-frequency vocabulary;
encode = greedily apply the learned merges in training order per word.

Scale shape (the same division of labor real tokenizer trainings use, and
the same pattern as ``similarity.kmeans_centroids``): the CORPUS-sized work
— word counting — is a distributed explode + groupBy (one shuffle over the
100 TB input); the merge loop then runs driver-side over the aggregated
(word, freq) vocabulary, which is orders of magnitude smaller and BOUNDED
here by ``max_vocab`` top-frequency rows (deterministic order). Encoding is
an Arrow-batched stage with the merge table broadcast in the closure — one
pass per document, no shuffle, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from tilecloud_chain_spark.operators.text import tokens

#: end-of-word marker appended to each word's symbol sequence (standard BPE)
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over lowercased whitespace tokens — the distributed,
    corpus-sized half of BPE training."""
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def train_bpe_merges(
    word_freqs: DataFrame, num_merges: int = 100, max_vocab: int = 50_000
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules from a (word, freq) table.

    Collects the top ``max_vocab`` words (freq desc, word asc —
    deterministic) and runs the pair-count/merge loop driver-side; ties on
    pair count break lexicographically so the merge table is reproducible.
    Stops early when no pair occurs twice."""
    rows = (
        word_freqs.orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(int(max_vocab))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        syms = tuple(list(r["word"]) + [EOW])
        vocab[syms] = vocab.get(syms, 0) + int(r["freq"])

    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        top = max(counts.values())
        if top < 2:
            break
        best = min(p for p, c in counts.items() if c == top)
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
    return merges


def load_merges(source) -> list[tuple[str, str]]:
    """Parse a public GPT-2-style ``merges.txt`` into a merge table usable
    by :func:`bpe_encode`: one ``left right`` pair per line in rank order,
    an optional ``#version`` header, blank lines skipped (the format
    popularized by the GPT-2 release and used by most published
    tokenizers). ``source`` is a file path or an iterable of lines.

    Tables trained elsewhere usually carry no ``</w>`` end-of-word marker
    (GPT-2 is byte-level with a space-prefix convention instead) — encode
    such tables with ``bpe_encode(..., add_eow=False)``. Tables written by
    :func:`merges_to_lines` round-trip exactly, marker included.

    Which encoder a table needs: :func:`bpe_encode` is a lowercasing,
    whitespace-splitting WORD-level encoder for tables trained by
    :func:`train_bpe` / written by :func:`merges_to_lines`. Byte-level
    tables (GPT-2/RoBERTa — the dominant published format, recognizable by
    the ``Ġ`` space-prefix convention in their pairs) are keyed on the
    byte-alias alphabet and must be encoded with :func:`bpe_encode_bytes`,
    which implements the full GPT-2 convention (published pre-tokenizer
    regex + byte-to-printable-unicode alias + rank-greedy merges, no
    ``</w>``) and reproduces the source tokenizer exactly."""
    if isinstance(source, str):
        with open(source) as f:
            lines = f.read().splitlines()
    else:
        lines = list(source)
    merges: list[tuple[str, str]] = []
    for ln, line in enumerate(lines, 1):
        s = line.strip()
        # ONLY the first line's '#version' prefix is a header — published
        # merge tables legitimately contain pairs whose left token starts
        # with '#' (e.g. '# #' building a '##' token); skipping every
        # '#'-line would silently drop those merges
        if not s or (ln == 1 and s.startswith("#version")):
            continue
        parts = s.split(" ")
        if len(parts) != 2:
            raise ValueError(
                f"merges line {ln}: expected 'left right', got {line!r}"
            )
        merges.append((parts[0], parts[1]))
    return merges


def merges_to_lines(merges: list[tuple[str, str]]) -> list[str]:
    """Serialize a merge table to GPT-2 ``merges.txt`` lines (with the
    conventional version header); ``load_merges`` round-trips exactly."""
    return ["#version: 0.2"] + [f"{a} {b}" for a, b in merges]


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], add_eow: bool = True
) -> list[str]:
    """Standard greedy BPE apply: repeatedly merge the pair with the LOWEST
    training rank until none applies."""
    syms = list(word) + ([EOW] if add_eow else [])
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    add_eow: bool = True,
) -> DataFrame:
    """Tokenize each document with a merge table — trained here
    (:func:`train_bpe`, default) or loaded from a public GPT-2-format
    ``merges.txt`` (:func:`load_merges`; pass ``add_eow=False`` for tables
    with no ``</w>`` convention). Output: (id_col, bpe_tokens
    array<string>, n_bpe_tokens int). One Arrow-batched stage; the merge
    table (tiny) ships in the closure; per-word results are memoized
    within each batch (corpora repeat words heavily)."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def encode(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, counts = [], []
            for t in pdf[text_col]:
                out: list[str] = []
                for w in (t or "").lower().split():
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks, add_eow)
                        cache[w] = enc
                    out.extend(enc)
                toks_col.append(out)
                counts.append(len(out))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "bpe_tokens": toks_col,
                "n_bpe_tokens": pd.array(counts, dtype="int32"),
            })

    id_type = dict(df.dtypes)[id_col]
    from tilecloud_chain_spark.session import ensure_parallelism

    src = ensure_parallelism(df.select(id_col, text_col))
    return src.mapInPandas(
        encode, f"{id_col} {id_type}, bpe_tokens array<string>, n_bpe_tokens int"
    )


def train_bpe(df: DataFrame, num_merges: int = 100, max_vocab: int = 50_000,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Convenience: distributed word count + driver merge loop."""
    return train_bpe_merges(word_frequencies(df, text_col), num_merges, max_vocab)


# --------------------------------------------------------------------------
# byte-level encoding (the GPT-2/RoBERTa convention — what published
# merges.txt tables actually expect)
# --------------------------------------------------------------------------

#: the published GPT-2 pre-tokenizer pattern (contractions, space-prefixed
#: letter/number/symbol runs, trailing-whitespace lookahead) — needs the
#: ``regex`` module for \p{L}/\p{N} unicode categories
GPT2_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)


def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte -> printable-unicode alias table (from the
    GPT-2 release, public knowledge): every byte gets a single printable
    unicode character so BPE can operate on lossless byte sequences as
    strings. Printable latin bytes (``!``..``~``, ``¡``..``¬``,
    ``®``..``ÿ``) alias to themselves; the remaining 68 bytes map, in
    order, to ``chr(256 + n)`` — hence space -> ``Ġ`` (chr(288)) and
    newline -> ``Ċ`` (chr(266)), the markers visible in every published
    byte-level merges.txt."""
    identity = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    table = {b: chr(b) for b in identity}
    n = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + n)
            n += 1
    return table


def byte_alias_decode(tokens: list[str]) -> str:
    """Invert :func:`bytes_to_unicode` over a token sequence: byte-level
    BPE is lossless, so decoding the concatenated aliases recovers the
    original text exactly (tested as a round-trip property)."""
    back = {c: b for b, c in bytes_to_unicode().items()}
    return bytes(back[c] for t in tokens for c in t).decode("utf-8")


def bpe_encode_bytes(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Byte-level BPE encode with the full GPT-2 convention, so PUBLISHED
    merge tables (GPT-2, RoBERTa, and their many descendants — the most
    common real tokenizer format in LLM pipelines) reproduce their source
    tokenization exactly: pre-tokenize with the published regex (keeps
    contractions and the space-prefix with the following word), alias each
    pre-token's UTF-8 bytes through :func:`bytes_to_unicode` (one symbol
    per byte), then rank-greedy merges — always the LOWEST-rank applicable
    pair next, never left-to-right. No lowercasing, no ``</w>``.

    Output and scale shape match :func:`bpe_encode`: (id_col, bpe_tokens
    array<string>, n_bpe_tokens int) from one Arrow-batched stage, merge
    table broadcast in the closure, per-pre-token memoization within each
    batch (natural text repeats pre-tokens heavily)."""
    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def encode(batches):
        import regex

        pat = regex.compile(GPT2_SPLIT_PATTERN)
        alias = bytes_to_unicode()
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, counts = [], []
            for t in pdf[text_col]:
                out: list[str] = []
                for piece in pat.findall(t or ""):
                    enc = cache.get(piece)
                    if enc is None:
                        sym = "".join(alias[b] for b in piece.encode("utf-8"))
                        enc = _encode_word(sym, ranks, add_eow=False)
                        cache[piece] = enc
                    out.extend(enc)
                toks_col.append(out)
                counts.append(len(out))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "bpe_tokens": toks_col,
                "n_bpe_tokens": pd.array(counts, dtype="int32"),
            })

    id_type = dict(df.dtypes)[id_col]
    from tilecloud_chain_spark.session import ensure_parallelism

    src = ensure_parallelism(df.select(id_col, text_col))
    return src.mapInPandas(
        encode, f"{id_col} {id_type}, bpe_tokens array<string>, n_bpe_tokens int"
    )
