"""Pure-Python text-analysis functions — oracles for the Spark operators in
``logagg.textstats`` / ``logagg.dedup``. Deterministic, dependency-free."""

from __future__ import annotations

import re
import zlib

from logagg.schemas import (
    FP_BASE,
    FP_MOD,
    JACCARD_DEN,
    JACCARD_NUM,
    LANG_MARKERS,
    LANG_UNKNOWN,
    SHINGLE_K,
    SHINGLE_SEP,
)

# The token contract, pinned across engines: split on runs of ASCII
# whitespace — exactly Java's default \s class ([ \t\n\x0b\f\r]), which is
# what Spark's split() sees. Python str.split() and RE2 \s (DuckDB) each
# use a DIFFERENT whitespace set (Unicode incl. \xa0 / missing \x0b), so
# both oracles spell the class explicitly instead.
_WS_RE = re.compile(r"[ \t\n\x0b\f\r]+")


def tokens(text: str) -> list[str]:
    """ASCII-whitespace tokenization (runs of [ \\t\\n\\x0b\\f\\r]; no empties)."""
    return [t for t in _WS_RE.split(text) if t]


def shingle_set(text: str, k: int = SHINGLE_K) -> set[str]:
    """Set of k-token shingles; short docs collapse to one whole-doc shingle."""
    toks = tokens(text)
    if len(toks) < k:
        return {SHINGLE_SEP.join(toks)} if toks else set()
    return {SHINGLE_SEP.join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def jaccard_ge_threshold(shared: int, na: int, nb: int) -> bool:
    """J = shared/(na+nb-shared) >= 0.8, in exact integer arithmetic."""
    return JACCARD_NUM * shared >= JACCARD_DEN * (na + nb)


def lang_id(text: str) -> str:
    """Marker-token language ID: argmax of per-language marker hits over the
    token multiset; ties break to the lexicographically smallest language;
    zero hits everywhere → "und"."""
    toks = tokens(text)
    best_lang = LANG_UNKNOWN
    best_score = 0
    for lang in sorted(LANG_MARKERS):
        markers = set(LANG_MARKERS[lang])
        score = sum(1 for t in toks if t in markers)
        if score > best_score:
            best_score = score
            best_lang = lang
    return best_lang


def fingerprint(text: str) -> int:
    """Polynomial rolling hash over UTF-8 bytes, mod 2^61-1 (fits int64)."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * FP_BASE + b) % FP_MOD
    return h


def quality_score(text: str, n_chars: int) -> float:
    """Document quality heuristic: mix of length saturation and stopword
    density. Pure arithmetic on ints + one division → bit-identical across
    engines given the same inputs."""
    toks = tokens(text)
    n_tokens = len(toks)
    if n_tokens == 0:
        return 0.0
    stop_hits = sum(1 for t in toks if t in ("the", "a", "and", "of"))
    len_score = min(n_chars, 400) / 400.0
    stop_ratio = stop_hits / n_tokens
    return 0.5 * len_score + 0.5 * stop_ratio


def ngram_set(text: str, n: int) -> set[str]:
    """Distinct space-joined token n-grams (no short-doc fallback: a doc
    with fewer than ``n`` tokens yields the empty set — GPT-3-style
    decontamination semantics, where too-short docs cannot collide with a
    benchmark n-gram)."""
    toks = tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def repetition_stats_py(text: str) -> dict:
    """Pure-Python oracle for ``textstats.repetition_stats`` (Gopher-style
    repetition signals). Ties in the "most frequent n-gram" pick resolve
    to the lexicographically greatest gram — pinned in both engines."""
    lines = [ln for ln in text.split("\n") if ln != ""]
    n_lines = len(lines)
    total_chars = len(text)
    from collections import Counter

    lc = Counter(lines)
    dup_line_frac = (n_lines - len(lc)) / n_lines if n_lines else 0.0
    dup_line_chars = sum(c * len(ln) for ln, c in lc.items() if c >= 2)
    line_chars = sum(len(ln) for ln in lines)
    dup_line_char_frac = dup_line_chars / line_chars if line_chars else 0.0

    toks = tokens(text)
    out = {
        "n_lines": n_lines,
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
    }
    for n in (2, 3, 4):
        grams = Counter(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
        if grams and total_chars:
            top_c, top_g = max((c, g) for g, c in grams.items())
            out[f"top{n}_char_frac"] = min(1.0, top_c * len(top_g) / total_chars)
        else:
            out[f"top{n}_char_frac"] = 0.0
    grams10 = Counter(" ".join(toks[i : i + 10]) for i in range(len(toks) - 10 + 1))
    dup10 = sum(c * len(g) for g, c in grams10.items() if c >= 2)
    out["dup10_char_frac"] = min(1.0, dup10 / total_chars) if total_chars else 0.0
    return out


# PII redaction patterns — single source of truth for both engines. Kept to
# the regex dialect intersection of java.util.regex and Python re (ASCII
# classes, \b, non-capturing groups) so one string drives both.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
)


def redact_pii_py(text: str) -> str:
    """Pure-Python oracle for textstats.redact_pii (same patterns, same
    order — order matters: an email is redacted before its domain's dots
    can look like an IPv4)."""
    for _, pat, repl in PII_PATTERNS:
        text = re.sub(pat, repl, text)
    return text


def repeated_ngram_spans_py(
    texts: dict, n: int = 50, min_count: int = 2
) -> dict:
    """Pure-Python oracle for ``dedup.repeated_ngram_spans``: token spans
    (start, end) per doc covered by an ``n``-token run that occurs at
    least ``min_count`` times across the corpus (all positions counted,
    within-doc repeats included). Overlapping/adjacent spans are merged."""
    from collections import Counter

    toks = {i: tokens(t) for i, t in texts.items()}
    counts: Counter = Counter()
    for ts in toks.values():
        for p in range(len(ts) - n + 1):
            counts[" ".join(ts[p : p + n])] += 1
    out: dict = {}
    for i, ts in toks.items():
        hits = [
            p
            for p in range(len(ts) - n + 1)
            if counts[" ".join(ts[p : p + n])] >= min_count
        ]
        spans: list = []
        for p in hits:
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + n))
            else:
                spans.append((p, p + n))
        if spans:
            out[i] = spans
    return out


def mix_uniform_py(seed: str, doc_id) -> float:
    """Twin of ``logagg.mix.mix_uniform``: first 8 hex chars of
    md5("<seed>:<id>") over 2^32 — exact in a double (numerator < 2^32,
    divisor a power of two), so equality with Spark is bitwise."""
    import hashlib

    h = hashlib.md5(f"{seed}:{doc_id}".encode("utf-8")).hexdigest()
    return int(h[:8], 16) / 4294967296.0


def mix_copies_py(seed: str, doc_id, weight: float) -> int:
    """Twin of ``logagg.mix.mix_copies``: floor(w) + (u < frac(w))."""
    import math

    base = math.floor(weight)
    return int(base) + (1 if mix_uniform_py(seed, doc_id) < (weight - base) else 0)


def token_budget_plan_py(
    token_counts: dict,
    target_tokens: int,
    alpha: float = 1.0,
    max_epochs=4.0,
) -> dict:
    """Independent twin of ``logagg.mix.token_budget_plan_counts``:
    reaches the water-fill fixpoint by naive iteration (re-scale the
    uncapped sources, cap any violator, repeat — terminates in ≤
    #sources rounds because the capped set only grows) instead of the
    closed-form ratio-sorted pivot scan. Tests diff the two allocations
    to 1e-9 relative."""
    import math

    sources = sorted(token_counts)
    n = {s: max(0, int(token_counts[s])) for s in sources}
    total = sum(n.values())
    q = {s: (n[s] / total) ** alpha if total and n[s] else 0.0 for s in sources}
    z = sum(q.values())
    q = {s: (q[s] / z if z else 0.0) for s in sources}

    def cap_for(s):
        e = max_epochs.get(s, 0.0) if isinstance(max_epochs, dict) else max_epochs
        return float(e) * n[s]

    cap = {s: cap_for(s) for s in sources}
    budget = float(min(target_tokens, sum(cap.values())))
    capped: set = set()
    alloc = {s: 0.0 for s in sources}
    while True:
        free = [s for s in sources if s not in capped and q[s] > 0]
        rem_b = budget - sum(cap[s] for s in capped)
        rem_q = sum(q[s] for s in free)
        lam = rem_b / rem_q if rem_q else 0.0
        violators = [s for s in free if lam * q[s] > cap[s]]
        if not violators:
            for s in free:
                alloc[s] = lam * q[s]
            for s in capped:
                alloc[s] = cap[s]
            break
        capped.update(violators)
    allocated = math.fsum(alloc.values())
    return {
        "plan": [
            {
                "source": s,
                "tokens": n[s],
                "alloc_tokens": alloc[s],
                "epochs": (alloc[s] / n[s]) if n[s] else 0.0,
                "capped": s in capped,
            }
            for s in sources
        ],
        "target_tokens": int(target_tokens),
        "allocated_tokens": allocated,
        "unfilled_tokens": max(0.0, target_tokens - allocated),
    }


def order_key_py(seed: str, epoch, doc_id) -> str:
    """Twin of ``logagg.mix.training_order``'s key column."""
    import hashlib

    return hashlib.md5(f"{seed}:{epoch}:{doc_id}".encode("utf-8")).hexdigest()


def ppl_buckets_py(rows: list[tuple], k: int = 4096) -> dict:
    """Twin of ``logagg.lm.ppl_buckets``'s sampling + cut + assignment
    (scores come from the already-twinned perplexity kernel): rows are
    (id, lang, ppl); returns {str(id): bucket}. Per lang group (None →
    ""), the k smallest (md5(str(id)), str(id)) among non-null-ppl rows
    give type-1 tercile cuts at ranks ceil(n/3)/ceil(2n/3); NULL ppl or
    a group with no cuts → tail."""
    import hashlib
    import math

    groups: dict = {}
    for doc_id, lang, ppl in rows:
        g = "" if lang is None else str(lang)
        if ppl is not None:
            sid = str(doc_id)
            h = hashlib.md5(sid.encode("utf-8")).hexdigest()
            groups.setdefault(g, []).append((h, sid, ppl))
    cuts = {}
    for g, keyed in groups.items():
        keyed.sort()
        vals = sorted(p for _, _, p in keyed[:k])
        nn = len(vals)
        cuts[g] = (
            vals[max(0, math.ceil(nn / 3) - 1)],
            vals[max(0, math.ceil(2 * nn / 3) - 1)],
        )
    out = {}
    for doc_id, lang, ppl in rows:
        g = "" if lang is None else str(lang)
        if ppl is None or g not in cuts:
            out[str(doc_id)] = "tail"
        elif ppl <= cuts[g][0]:
            out[str(doc_id)] = "head"
        elif ppl <= cuts[g][1]:
            out[str(doc_id)] = "middle"
        else:
            out[str(doc_id)] = "tail"
    return out


def host_suffixes_py(host: str | None) -> list[str]:
    """Twin of ``logagg.mix.host_suffixes``."""
    if host is None:
        return []
    parts = host.split(".")
    return [".".join(parts[i:]) for i in range(len(parts))]


def cut_spans_py(text: str, spans: list) -> str:
    """Remove the given token spans (start inclusive, end exclusive) from
    the text; remaining tokens re-join with single spaces (the pinned
    whitespace normalization of the cut operation)."""
    ts = tokens(text)
    drop = set()
    for a, b in spans:
        drop.update(range(a, b))
    return " ".join(t for i, t in enumerate(ts) if i not in drop)


def score_tokens_py(toks: list, lm) -> tuple:
    """Stupid-backoff n-gram scoring — THE single-source kernel behind
    ``logagg.lm.doc_perplexity`` (same pattern as repetition_stats_py):
    left-to-right over the UNK-mapped token stream,

        S(w | u, v)  = c(u v w) / c(u v)           trigram AND its context
                                                   bigram both kept
                     = alpha * S(w | v)            otherwise
        S(w | prev)  = c(prev w) / c(prev)         when the bigram is kept
                     = alpha * S_uni(w)            otherwise
        S_uni(w)     = (c(w) + 1) / (total + V)    (add-one: UNK may have
                                                    count 0; V counts the
                                                    UNK bucket)

    with no alpha on the first token (no context to back off from) and
    plain bigram scoring on the second. Trigram logic engages ONLY when
    ``lm.trigrams`` is non-empty — an order-2 model scores bit-identically
    to the pre-trigram kernel (same folds, same libm calls).
    Returns (n_tokens, sum log S, perplexity = exp(-mean log S)); empty
    docs return (0, 0.0, None). Deterministic: integer counts, a fixed
    fold order, one libm — bit-identical across runs and partitionings.
    ``lm`` is any object with vocab/unk_n/total/bigrams/alpha/n_vocab
    (+ optional trigrams; duck-typed so this module stays
    import-cycle-free)."""
    import math

    from logagg.schemas import LM_UNK

    n = len(toks)
    if n == 0:
        return 0, 0.0, None
    v = lm.n_vocab
    tri = getattr(lm, "trigrams", None)
    logp = 0.0
    prev2 = prev = None
    for t in toks:
        w = t if t in lm.vocab else LM_UNK
        if tri and prev2 is not None:
            c3 = tri.get(prev2 + " " + prev + " " + w)
            c2 = lm.bigrams.get(prev2 + " " + prev)
            if c3 and c2:
                logp += math.log(c3 / c2)
                prev2, prev = prev, w
                continue
        big = lm.bigrams.get(prev + " " + w) if prev is not None else None
        if big:
            p2 = big / (lm.unk_n if prev == LM_UNK else lm.vocab[prev])
        else:
            uni = ((lm.unk_n if w == LM_UNK else lm.vocab[w]) + 1) / (lm.total + v)
            p2 = uni if prev is None else lm.alpha * uni
        logp += math.log(p2 if not (tri and prev2 is not None) else lm.alpha * p2)
        prev2, prev = prev, w
    return n, logp, math.exp(-logp / n)


def chunk_documents_py(text: str, max_tokens: int, overlap: int = 0) -> list:
    """Twin of ``textstats.chunk_documents``: the list of chunk texts for
    one document, in chunk_idx order."""
    import math

    ts = tokens(text)
    n = len(ts)
    if n == 0:
        return []
    step = max_tokens - overlap
    last = 0 if n <= max_tokens else math.ceil((n - max_tokens) / step)
    return [" ".join(ts[k * step : k * step + max_tokens]) for k in range(last + 1)]


def bpe_word_py(word: str, ranks: dict) -> list:
    """GPT-2-style BPE application to one pre-token — THE single-source
    kernel behind ``logagg.bpe.bpe_encode``: repeatedly merge ALL
    occurrences of the present pair with the lowest merge rank until no
    adjacent pair is ranked. Equivalent to replaying the learned merges
    in training order restricted to pairs actually present — the standard
    encoder formulation. Deterministic: ranks are unique, so the min is;
    unranked pairs never merge."""
    syms = list(word)
    while len(syms) >= 2:
        best = None
        best_rank = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        a, b = best
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def dedup_paragraphs_py(texts: dict) -> dict:
    """Twin of ``dedup.dedup_paragraphs``: id → (new_text, kept, dropped)
    under the same keeper rule — smallest (md5("<id>:<idx>"), str(id),
    idx) occurrence of each distinct paragraph survives."""
    import hashlib

    occs = []  # (okey, id_str, idx, para) per non-empty paragraph
    per_doc: dict = {i: [] for i in texts}
    for i, t in texts.items():
        idx = 0
        for para in re.split(r"\n\n+", t or ""):
            if para == "":
                idx += 1
                continue
            okey = hashlib.md5(f"{i}:{idx}".encode()).hexdigest()
            occs.append((okey, str(i), idx, para))
            per_doc[i].append((idx, para))
            idx += 1
    keep: dict = {}
    for okey, sid, idx, para in occs:
        h = hashlib.md5(para.encode()).hexdigest()
        cand = (okey, sid, idx)
        if h not in keep or cand < keep[h]:
            keep[h] = cand
    out = {}
    for i, t in texts.items():
        kept = [
            (idx, para)
            for idx, para in per_doc[i]
            if keep[hashlib.md5(para.encode()).hexdigest()]
            == (hashlib.md5(f"{i}:{idx}".encode()).hexdigest(), str(i), idx)
        ]
        total = len(per_doc[i])
        out[i] = ("\n\n".join(p for _, p in sorted(kept)), len(kept), total - len(kept))
    return out


_URL_SPLIT_RE = re.compile(
    r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"
)
_TRACKING_RE = re.compile(
    r"^(utm_[^=&]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=|$)"
)


def canonical_url_py(url: str) -> str:
    """Twin of ``textstats.canonical_url`` (well-formed urls; junk passes
    through unchanged on both engines)."""
    m = _URL_SPLIT_RE.match(url or "")
    if not m:
        return url
    proto = m.group(1).lower()
    auth = re.sub(r"^www\.", "", m.group(2).lower())
    if proto == "http":
        auth = re.sub(r":80$", "", auth)
    elif proto == "https":
        auth = re.sub(r":443$", "", auth)
    path = re.sub(r"/+$", "", m.group(3))
    params = sorted(
        p for p in (m.group(4) or "").split("&") if p and not _TRACKING_RE.match(p)
    )
    qs = "&".join(params)
    return f"{proto}://{auth}{path}" + (f"?{qs}" if qs else "")


# block-level tags: opening OR closing one ends the current text block
_HTML_BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 td th tr table pre blockquote article "
    "section header footer nav aside main figure form br hr".split()
)
_HTML_SKIP_TAGS = frozenset("script style noscript template".split())


def extract_blocks_py(html: str) -> list:
    """Block segmentation of an HTML page via the stdlib tag-soup parser:
    [(block_text, link_chars)] with block text whitespace-normalized to
    single-space tokens, entities decoded, script/style subtrees dropped.
    THE single-source kernel behind ``extract.extract_main_content``."""
    from html.parser import HTMLParser

    blocks: list = []

    class _P(HTMLParser):
        def __init__(self) -> None:
            super().__init__(convert_charrefs=True)
            self.skip = 0
            self.a_depth = 0
            self.parts: list = []
            self.link_chars = 0

        def _flush(self) -> None:
            text = " ".join(tokens(" ".join(self.parts)))
            if text:
                blocks.append((text, self.link_chars))
            self.parts = []
            self.link_chars = 0

        def handle_starttag(self, tag, attrs):
            if tag in _HTML_SKIP_TAGS:
                self.skip += 1
            elif tag in _HTML_BLOCK_TAGS:
                self._flush()
            elif tag == "a":
                self.a_depth += 1

        def handle_startendtag(self, tag, attrs):
            if tag in _HTML_BLOCK_TAGS:
                self._flush()

        def handle_endtag(self, tag):
            if tag in _HTML_SKIP_TAGS:
                self.skip = max(0, self.skip - 1)
            elif tag in _HTML_BLOCK_TAGS:
                self._flush()
            elif tag == "a":
                self.a_depth = max(0, self.a_depth - 1)

        def handle_data(self, data):
            if self.skip:
                return
            self.parts.append(data)
            if self.a_depth > 0:
                self.link_chars += len("".join(data.split()))

    p = _P()
    p.feed(html or "")
    p.close()
    p._flush()
    return blocks


def main_content_py(
    html: str, min_tokens: int = 8, max_link_density: float = 0.5
) -> tuple:
    """(content, n_blocks, n_kept): keep blocks with >= min_tokens tokens
    whose link density (link chars / non-space block chars) is <=
    max_link_density; join kept blocks with blank lines."""
    blocks = extract_blocks_py(html)
    kept = []
    for text, link_chars in blocks:
        toks = tokens(text)
        dense = len("".join(toks))
        ld = (link_chars / dense) if dense else 1.0
        if len(toks) >= min_tokens and ld <= max_link_density:
            kept.append(text)
    return "\n\n".join(kept), len(blocks), len(kept)


def collocations_py(
    texts: list[str], *, min_count: int = 5, top_k: int = 100
) -> list[tuple[str, str, int, float]]:
    """Driver-side twin of :func:`logagg.textstats.collocations` —
    PMI-ranked adjacent word pairs over the pinned token contract.
    Returns ``[(w1, w2, n_pair, pmi)]``, pmi desc then (w1, w2) asc."""
    import math
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for t in texts:
        toks = tokens(t or "")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    n_bi = sum(bi.values())
    n_uni = sum(uni.values())
    out = []
    for (x, y), c in bi.items():
        if c < min_count:
            continue
        # EXACT expression mirrored by the Spark column — same division
        # order, so both engines round identically
        pmi = math.log(
            (c / n_bi) / ((uni[x] / n_uni) * (uni[y] / n_uni))
        )
        out.append((x, y, c, pmi))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:top_k]


def strip_host_boilerplate_py(
    pages: list[tuple[str, str]],
    *,
    min_share: float = 0.5,
    min_pages: int = 3,
    min_chars: int = 4,
) -> dict[str, tuple[str, int]]:
    """Driver-side twin of ``textstats.strip_host_boilerplate`` —
    ``{url: (new_text, n_lines_dropped)}`` with the same host key
    (well-formed urls; junk pools into the sentinel host), line split,
    participation rule, and share threshold."""
    from collections import defaultdict

    _URL_HOST_SENTINEL = "\x00invalid"

    def host_of(url: str) -> str:
        m = _URL_SPLIT_RE.match(url or "")
        if not m or not m.group(2):
            return _URL_HOST_SENTINEL
        return re.sub(r":[0-9]+$", "", m.group(2).rsplit("@", 1)[-1])

    by_host: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for u, t in pages:
        by_host[host_of(u)].append((u, t or ""))
    out: dict[str, tuple[str, int]] = {}
    for _, hp in by_host.items():
        n_pages = len({u for u, _ in hp})
        line_pages: dict[str, set] = defaultdict(set)
        for u, t in hp:
            for ln in t.split("\n"):
                if len(ln) >= min_chars:
                    line_pages[ln].add(u)
        for u, t in hp:
            kept, dropped = [], 0
            for ln in t.split("\n"):
                lp = len(line_pages.get(ln, ()))
                if (
                    len(ln) >= min_chars
                    and lp >= min_pages
                    and lp / n_pages >= min_share
                ):
                    dropped += 1
                else:
                    kept.append(ln)
            out[u] = ("\n".join(kept), dropped)
    return out


_C4_TRAIL_WS_RE = re.compile(r"[ \t\x0b\f\r]+$")
_C4_WORD_RE = re.compile(r"[ \t\x0b\f\r]+")
_C4_SENT_RE = re.compile(r"[.!?][\"']?[ \t\n\x0b\f\r]")


def c4_filter_py(
    text: str,
    *,
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    bad_words: tuple[str, ...] = (),
) -> tuple[str, int, int, bool]:
    """Independent twin of ``textstats.c4_filters`` (differential oracle,
    not a shared kernel — the Spark side is pure Catalyst). Returns
    ``(kept_text, n_lines_dropped, n_sentences, keep_doc)``."""
    text = text or ""
    kept: list[str] = []
    dropped = 0
    for ln in text.split("\n"):
        trimmed = _C4_TRAIL_WS_RE.sub("", ln)
        ends_ok = bool(trimmed) and trimmed[-1] in '.!?"'
        n_words = len([w for w in _C4_WORD_RE.split(ln) if w])
        no_js = "javascript" not in ln.lower()
        if ends_ok and n_words >= min_words_per_line and no_js:
            kept.append(ln)
        else:
            dropped += 1
    kept_text = "\n".join(kept)
    n_sent = len(_C4_SENT_RE.findall(kept_text + "\n"))
    keep_doc = (
        "{" not in text
        and "lorem ipsum" not in text.lower()
        and n_sent >= min_sentences
    )
    if keep_doc and bad_words:
        lowered = {w.lower() for w in bad_words}
        keep_doc = not (set(tokens(text.lower())) & lowered)
    return kept_text, dropped, n_sent, keep_doc


def hashed_ngrams_py(text: str, buckets: int) -> list[int]:
    """Hashed unigram+bigram bag features (the DSIR feature map, Xie et
    al. 2023 §3): lowercase, ASCII-ws tokenize, hash each unigram and
    adjacent bigram into ``buckets`` via crc32. Single-source kernel —
    the Spark Arrow pass and the Python twin both call this, so bucket
    ids agree bit-for-bit."""
    toks = tokens((text or "").lower())
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [zlib.crc32(g.encode("utf-8")) % buckets for g in grams]


def gumbel_py(seed: str, doc_id) -> float:
    """Deterministic standard-Gumbel draw keyed by (seed, id): the
    md5-uniform recentered to (h+0.5)/2^32 — never exactly 0 or 1, so the
    double log is always finite. Exact in a double (numerator < 2^33 over
    a power of two), hence bit-identical across engines."""
    import hashlib
    import math

    h = int(hashlib.md5(f"{seed}:{doc_id}".encode("utf-8")).hexdigest()[:8], 16)
    u = (h + 0.5) / 4294967296.0
    return -math.log(-math.log(u))


def dsir_logw_py(bucket_ids: list[int], log_ratio) -> float:
    """Left-fold importance log-weight: sum of per-occurrence
    log p_target(b) − log p_raw(b) lookups, in feature order. The fold
    order is part of the contract (float addition is not associative);
    both engines call this one function."""
    s = 0.0
    for b in bucket_ids:
        s += float(log_ratio[b])
    return s


def weighted_sample_py(rows: list[tuple], k: int, seed: str = "wrs") -> list:
    """Twin of ``logagg.mix.weighted_sample``: rows are (id, weight);
    returns the ids of the k largest ln(u)/w keys, u = (h+1)/2^32 from
    the md5 uniform, ties broken by id ascending. Same
    exclude-nonpositive/nonfinite rule."""
    import hashlib
    import math

    keyed = []
    for doc_id, w in rows:
        if w is None or not (w > 0) or not math.isfinite(w):
            continue
        h = int(
            hashlib.md5(f"{seed}:{doc_id}".encode("utf-8")).hexdigest()[:8], 16
        )
        u = (h + 1) / 4294967296.0
        keyed.append((-(math.log(u) / w), doc_id))
    keyed.sort()
    return [doc_id for _, doc_id in keyed[:k]]


def yield_curve_py(
    rows: list[tuple], thresholds: list[float]
) -> list[dict]:
    """Twin of ``logagg.textstats.yield_curve``: rows are (score, weight)
    with weight possibly None; NaN/None scores excluded from numerator
    and denominator."""
    import math

    ts = sorted(set(float(t) for t in thresholds))
    scored = [
        (s, w) for s, w in rows if s is not None and not math.isnan(s)
    ]
    total = len(scored)
    wtotal = sum(w for _, w in scored if w is not None)
    out = []
    for t in ts:
        live = [(s, w) for s, w in scored if s >= t]
        n = len(live)
        wsum = sum(w for _, w in live if w is not None)
        out.append(
            {
                "threshold": t,
                "n_docs": n,
                "frac_docs": n / total if total else 0.0,
                "weight": wsum,
                "frac_weight": wsum / wtotal if wtotal else 0.0,
            }
        )
    return out


def winnow_py(
    text: str, k: int = 5, w: int = 4
) -> list[tuple[int, int]]:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every k-token gram, slide a
    window of ``w`` consecutive hashes, select the minimum per window
    (RIGHTMOST on ties — the choice that makes selections consistent
    across overlapping windows), and keep each selected (position, hash)
    once. Guarantee: any shared token run of length ≥ k + w - 1 between
    two documents yields at least one shared fingerprint, while only
    ~2/(w+1) of grams are kept. Hash = first 15 hex chars of md5 (the
    repo's engine-portable 60-bit convention). THE single-source kernel
    for ``logagg.textstats.winnow_fingerprints``."""
    import hashlib

    toks = tokens(text) if isinstance(text, str) else []
    if len(toks) < k:
        return []
    hs = [
        int(
            hashlib.md5(
                "\x1f".join(toks[i : i + k]).encode("utf-8")
            ).hexdigest()[:15],
            16,
        )
        for i in range(len(toks) - k + 1)
    ]
    out: list[tuple[int, int]] = []
    last = None
    for start in range(max(1, len(hs) - w + 1)):
        win = hs[start : start + w]
        m = min(win)
        # rightmost minimal position in this window
        pos = start + max(i for i, v in enumerate(win) if v == m)
        if (pos, m) != last:
            out.append((pos, m))
            last = (pos, m)
    return out
