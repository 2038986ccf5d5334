"""Text-analysis kernels: language-ID, quality scoring, token counting,
document fingerprinting.

These are the training-data operators layered on top of the extraction core
(driver brief; no counterpart in the reference repo). All pure and
deterministic; the Ray stages vectorize what they can and call these for the
per-document parts.
"""

from __future__ import annotations

import re

# Compact stopword profiles for the reference's supported OCR languages
# (/root/reference/server/src/utils/enums_tesseract.py:4-12). Top function
# words only — enough for a deterministic n-gram/stopword heuristic.
STOPWORDS: dict[str, frozenset[str]] = {
    "por": frozenset(
        "de a o que e do da em um para é com não uma os no se na por mais as dos como mas foi ao ele das tem à seu sua ou ser quando muito há nos já está eu também só pelo pela até isso ela entre era depois sem mesmo aos ter seus quem nas me esse eles estão você tinha foram essa num nem suas meu às minha têm numa pelos elas havia seja qual será nós tenho lhe deles essas esses pelas este fosse dele".split()
    ),
    "eng": frozenset(
        "the of and a to in is you that it he was for on are as with his they i at be this have from or one had by word but not what all were we when your can said there use an each which she do how their if will up other about out many then them these so some her would make like him into time has look two more write go see number no way could people my than first water been call who oil its now find".split()
    ),
    "deu": frozenset(
        "der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über einen so zum war haben nur oder aber vor zur bis mehr durch man sein wurde sei".split()
    ),
    "fra": frozenset(
        "de la le et les des en un du une que est pour qui dans a par plus pas au sur ne se ce il sont la aux avec son ses mais comme ou si leur y dont elle deux ni nous vous ils cette été tout fait être autre on je sa mes votre".split()
    ),
    "spa": frozenset(
        "de la que el en y a los del se las por un para con no una su al lo como más pero sus le ya o este sí porque esta entre cuando muy sin sobre también me hasta hay donde quien desde todo nos durante todos uno les ni contra otros ese eso ante ellos e esto mí antes algunos qué unos yo otro otras otra él tanto esa estos mucho quienes nada muchos cual poco ella estar estas algunas algo nosotros".split()
    ),
}

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish tokenizer: word pieces OR single non-space punctuation — the
# standard GPT-2-style pretokenizer shape (public), simplified.
_BPE_RE = re.compile(r"[A-Za-zÀ-ÖØ-öø-ÿ]+|\d+|[^\w\s]", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

LANGID_MIN_TOKENS = 3


def detect_language(text: str, default: str = "und") -> tuple[str, float]:
    """(lang, confidence): stopword-hit fraction per profile, argmax with
    alphabetical tiebreak; ``und`` when too short or no hits."""
    tokens = [t.lower() for t in _WORD_RE.findall(text)]
    if len(tokens) < LANGID_MIN_TOKENS:
        return default, 0.0
    n = len(tokens)
    best_lang, best_score = default, 0.0
    for lang in sorted(STOPWORDS):
        hits = sum(1 for t in tokens if t in STOPWORDS[lang])
        score = hits / n
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang, best_score


def token_count_ws(text: str) -> int:
    """Whitespace token count."""
    return len(text.split())


def token_count_bpe(text: str) -> int:
    """BPE-ish regex token count (word pieces + punctuation singletons)."""
    return len(_BPE_RE.findall(text))


def quality_features(text: str) -> dict:
    """Deterministic quality features for a document (Gopher/C4-style
    published heuristics): lengths, punctuation/uppercase/stopword ratios,
    mean word length, and a composite [0,1] score."""
    n_chars = len(text)
    words = text.split()
    n_words = len(words)
    n_punct = len(_PUNCT_RE.findall(text))
    n_upper = sum(1 for c in text if c.isupper())
    n_alpha = sum(1 for c in text if c.isalpha())
    mean_word_len = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    lowered = [w.strip(".,;:!?\"'()[]").lower() for w in words]
    stop_hits = sum(1 for w in lowered if any(w in s for s in STOPWORDS.values()))
    stop_ratio = stop_hits / n_words if n_words else 0.0
    punct_ratio = n_punct / n_chars if n_chars else 0.0
    upper_ratio = n_upper / n_alpha if n_alpha else 0.0

    score = 1.0
    if n_words < 10:
        score *= 0.2
    if not 2.0 <= mean_word_len <= 12.0:
        score *= 0.3
    if punct_ratio > 0.2:
        score *= 0.5
    if upper_ratio > 0.3:
        score *= 0.5
    if stop_ratio < 0.05 and n_words >= 10:
        score *= 0.5
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "upper_ratio": upper_ratio,
        "stop_ratio": stop_ratio,
        "quality_score": score,
    }


# ---------------------------------------------------------------- fingerprint

_FP_BASE = 1_000_003
_FP_MOD = (1 << 61) - 1


def rolling_hashes(text: str, k: int = 9) -> list[int]:
    """Karp-Rabin rolling hashes of every k-char window of the normalized
    text (lowercased, whitespace collapsed to single spaces)."""
    s = " ".join(text.lower().split())
    if len(s) < k:
        return [_string_hash(s)] if s else []
    power = pow(_FP_BASE, k - 1, _FP_MOD)
    h = 0
    out = []
    for i, ch in enumerate(s):
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
        if i >= k - 1:
            out.append(h)
            h = (h - ord(s[i - k + 1]) * power) % _FP_MOD
    return out


def _string_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
    return h


def winnow_fingerprint(text: str, k: int = 9, window: int = 4) -> list[int]:
    """Winnowing (Schleimer et al. 2003): min hash per sliding window of the
    rolling-hash sequence, deduplicated consecutively — a compact, alignment-
    robust document fingerprint."""
    hashes = rolling_hashes(text, k)
    if not hashes:
        return []
    if len(hashes) <= window:
        return [min(hashes)]
    picks = []
    last = None
    for i in range(len(hashes) - window + 1):
        m = min(hashes[i : i + window])
        if m != last:
            picks.append(m)
            last = m
    return picks
