"""Word-index build/merge + CSV rendering.

Parity targets:
- per-page index incl. the cross-line hyphenation merge with subword-count
  decrement: /root/reference/server/src/utils/export.py:492-530
  (``find_index_words``). The reference's exact control flow is preserved,
  including its quirks: the hyphen flag survives paragraph boundaries, the
  merged word is written back into the tree before counting, and tokens that
  normalize to the empty string are still counted.
- per-document merge + ``word.lower()+word`` sort:
  export.py:204-221 (CSV path). Deviation (documented): the reference merges
  pages in ``os.listdir`` order, which is filesystem-dependent; we merge in
  page-number order, which matches the commented-out sort the reference
  intended (export.py:206-207).
- CSV bytes: header ``Palavra,Ocorrências,Páginas``, a one-space spacer row,
  and a double-quoted pages field rendered through the csv module exactly
  like export.py:224-232 (``export_csv_from_words``).
"""

from __future__ import annotations

import csv
import io

from .textfn import index_sort_key, normalize_index_word


def page_index_words_texts(tree: list) -> dict[str, int]:
    """word → count for one page of texts-only nested lists
    ``[[ [word_str, ...] per line ] per section]``.

    The CALLER must own ``tree`` (fresh lists of immutable strings): the
    hyphen merge mutates ``line[0]`` in place exactly the way the reference
    mutates its loaded JSON — including the quirky ``section[line_idx-1][-1]``
    previous-word lookup that wraps to the section's LAST line when the
    hyphen flag crosses a paragraph boundary. Replaces the round-1
    ``copy.deepcopy(tree)`` per page (53% of the round-1 bench)."""
    index: dict[str, int] = {}
    pending_hyphen = False

    for section in tree:
        for line_idx, line in enumerate(section):
            if pending_hyphen:
                prev_word = section[line_idx - 1][-1]
                joined = prev_word.rstrip("-") + line[0]
                line[0] = joined
                pending_hyphen = False
                # retract the fragment that was already counted
                if index.get(prev_word, 0) != 0:
                    index[prev_word] = index.get(prev_word, 0) - 1
                    if index[prev_word] == 0:
                        del index[prev_word]

            last = len(line) - 1
            for pos, raw in enumerate(line):
                if pos == last and raw.endswith("-"):
                    pending_hyphen = True
                for token in raw.split():
                    index_key = normalize_index_word(token)
                    index[index_key] = index.get(index_key, 0) + 1

    return index


def page_index_words(tree: list) -> dict[str, int]:
    """word → count for one page tree (par/line/word dicts) — builds a
    private texts-only copy (strings are immutable, so no deepcopy needed)
    and runs :func:`page_index_words_texts`."""
    texts = [[[w["text"] for w in line] for line in section] for section in tree]
    return page_index_words_texts(texts)


def merge_page_indexes(page_indexes: list[dict[str, int]]) -> list[tuple[str, dict]]:
    """Merge per-page indexes (in page order) into the sorted document index.

    Returns ``[(word, {"count": int, "pages": "1, 3"}), ...]`` sorted by
    ``word.lower() + word``.
    """
    words: dict[str, dict] = {}
    for page_no, page_index in enumerate(page_indexes):
        for word, count in page_index.items():
            entry = words.get(word)
            if entry is None:
                words[word] = {"count": count, "pages": str(page_no + 1)}
            else:
                entry["count"] += count
                entry["pages"] += f", {page_no + 1}"
    return sorted(words.items(), key=lambda item: index_sort_key(item[0]))


def index_to_csv(index_data: list[tuple[str, dict]]) -> str:
    """Render the document index as CSV text, byte-equal to the reference's
    ``export_csv_from_words`` output (incl. the csv-module re-quoting of the
    pre-quoted pages field)."""
    buf = io.StringIO()
    writer = csv.writer(buf)
    writer.writerow(["Palavra", "Ocorrências", "Páginas"])
    writer.writerow([" "])
    for word, entry in index_data:
        writer.writerow([word, entry["count"], f'"{entry["pages"]}"'])
    return buf.getvalue()
