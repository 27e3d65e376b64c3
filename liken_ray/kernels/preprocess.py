"""String preprocessors: pure ``pa.Array -> pa.Array`` vectorized transforms.

Semantics mirror the reference's preprocessor set
(``/root/reference/src/liken/preprocessors.py:30-143``) but as plain
functions over Arrow arrays so they fuse into ``map_batches`` stages.
``remove_stopwords`` ships a static English stopword list (no runtime
downloads); ``normalize_names`` / ``normalize_company`` are rule-based
re-implementations of the same normalizations.
"""

from __future__ import annotations

import re
from typing import Callable, Literal

import pyarrow as pa
import pyarrow.compute as pc

# Standard English stopword list (the classic 127-word corpus-linguistics
# set used by common NLP toolkits).
ENGLISH_STOPWORDS: list[str] = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are", "was",
    "were", "be", "been", "being", "have", "has", "had", "having", "do",
    "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with",
    "about", "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in", "out",
    "on", "off", "over", "under", "again", "further", "then", "once",
    "here", "there", "when", "where", "why", "how", "all", "any", "both",
    "each", "few", "more", "most", "other", "some", "such", "no", "nor",
    "not", "only", "own", "same", "so", "than", "too", "very", "s", "t",
    "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't",
    "couldn", "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn",
    "hadn't", "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't", "shan",
    "shan't", "shouldn", "shouldn't", "wasn", "wasn't", "weren", "weren't",
    "won", "won't", "wouldn", "wouldn't",
]

PreprocessFn = Callable[[pa.Array], pa.Array]


class Preprocessor:
    """A named, picklable ``pa.Array -> pa.Array`` transform."""

    name: str = "preprocessor"

    def __call__(self, array: pa.Array) -> pa.Array:
        raise NotImplementedError

    def __repr__(self) -> str:
        return f"{self.name}()"


class _Strip(Preprocessor):
    name = "strip"

    def __call__(self, array: pa.Array) -> pa.Array:
        return pc.utf8_trim_whitespace(array)


class _Lower(Preprocessor):
    name = "lower"

    def __call__(self, array: pa.Array) -> pa.Array:
        return pc.utf8_lower(array)


class _Alnum(Preprocessor):
    name = "alnum"

    def __call__(self, array: pa.Array) -> pa.Array:
        return pc.replace_substring_regex(array, "[^0-9A-Za-z]+", "")


class _RemovePunctuation(Preprocessor):
    name = "remove_punctuation"

    def __call__(self, array: pa.Array) -> pa.Array:
        return pc.replace_substring_regex(array, r"[^\w\s]+", "")


class _NormalizeUnicode(Preprocessor):
    name = "normalize_unicode"

    def __init__(self, form: Literal["NFC", "NFKC", "NFD", "NFKD"] = "NFKD"):
        self._form = form

    def __call__(self, array: pa.Array) -> pa.Array:
        return pc.utf8_normalize(array, form=self._form)


class _AsciiFold(Preprocessor):
    name = "ascii_fold"

    def __call__(self, array: pa.Array) -> pa.Array:
        arr = pc.utf8_normalize(array, form="NFKD")
        return pc.replace_substring_regex(arr, "[̀-ͯ]", "")


class _RemoveStopwords(Preprocessor):
    name = "remove_stopwords"

    def __init__(self, words: list[str] | None = None, language: str = "english"):
        if words is None:
            if language != "english":
                raise ValueError(
                    "only a static english stopword list ships offline; pass `words`"
                )
            words = ENGLISH_STOPWORDS
        self._pattern = r"\b(" + "|".join(re.escape(w) for w in words) + r")\b"

    def __call__(self, array: pa.Array) -> pa.Array:
        return pc.replace_substring_regex(array, self._pattern, "")


_NAME_TITLES = {
    "mr", "mrs", "ms", "miss", "dr", "prof", "sir", "madam", "mx", "rev",
    "hon", "capt", "lt", "sgt", "col", "gen", "maj",
}
_NAME_SUFFIXES = {"jr", "sr", "ii", "iii", "iv", "phd", "md", "esq"}


class _NormalizeName(Preprocessor):
    """Keep 'first middle last'; strip titles, suffixes and parenthesised
    nicknames; clean commas ("Last, First" -> "First Last").
    """

    name = "normalize_names"

    def __call__(self, array: pa.Array) -> pa.Array:
        out = []
        for v in array.to_pylist():
            out.append(None if v is None else self._clean(v))
        return pa.array(out, type=pa.string())

    @staticmethod
    def _clean(name: str) -> str:
        name = re.sub(r"[(\"'].*?[)\"']", " ", name)  # nicknames
        if "," in name:
            parts = [p.strip() for p in name.split(",") if p.strip()]
            if len(parts) >= 2:
                name = parts[1] + " " + parts[0]
        words = [w for w in re.split(r"\s+", name) if w]
        kept = [
            w
            for w in words
            if w.lower().rstrip(".").lstrip(".") not in _NAME_TITLES | _NAME_SUFFIXES
        ]
        return " ".join(kept).strip()


_COMPANY_SUFFIX_RE = re.compile(
    r"[\s,]*\b(llc|l\.l\.c|ltd|l\.t\.d|limited|inc|incorporated|corp|"
    r"corporation|co|company|plc|gmbh|ag|sa|s\.a|srl|s\.r\.l|bv|b\.v|llp|"
    r"lp|pty|oy|ab|as|kg|nv|n\.v|sas|spa|s\.p\.a)\b\.?\s*$",
    re.IGNORECASE,
)


class _NormalizeCompany(Preprocessor):
    """Strip trailing legal-entity suffixes ('Ltd.', 'LLC', ...)."""

    name = "normalize_company"

    def __call__(self, array: pa.Array) -> pa.Array:
        out = []
        for v in array.to_pylist():
            if v is None:
                out.append(None)
                continue
            prev = None
            cur = v
            while prev != cur:
                prev = cur
                cur = _COMPANY_SUFFIX_RE.sub("", cur).rstrip(" ,.")
            out.append(cur.strip())
        return pa.array(out, type=pa.string())


# PUBLIC FACTORIES (match the reference's module-level API,
# ``preprocessors.py:149-215``):


def strip() -> Preprocessor:
    return _Strip()


def lower() -> Preprocessor:
    return _Lower()


def alnum() -> Preprocessor:
    return _Alnum()


def remove_punctuation() -> Preprocessor:
    return _RemovePunctuation()


def normalize_unicode(form: Literal["NFC", "NFKC", "NFD", "NFKD"] = "NFKD") -> Preprocessor:
    return _NormalizeUnicode(form=form)


def ascii_fold() -> Preprocessor:
    return _AsciiFold()


def remove_stopwords(words: list[str] | None = None, language: str = "english") -> Preprocessor:
    return _RemoveStopwords(words=words, language=language)


def normalize_names() -> Preprocessor:
    return _NormalizeName()


def normalize_company() -> Preprocessor:
    return _NormalizeCompany()


def apply_preprocessors(array: pa.Array, preprocessors: list[Preprocessor]) -> pa.Array:
    for p in preprocessors:
        array = p(array)
    return array
