"""Generator for ``bpe_merges.txt`` — a deterministic BPE merge-table fixture.

PROVENANCE: this container has no network access, so a published tokenizer's
merges file (GPT-2's vocab.bpe etc.) cannot be fetched; this fixture is
TRAINED here, by the repo's own ``spec.bpe.train_bpe`` (Sennrich BPE with a
pinned lexicographic tie-break), on the pinned English-ish corpus below.
That makes the merge table a pure function of this file: re-running the
script reproduces the committed fixture byte-for-byte
(tests/test_bpe.py pins its sha256).

The corpus is chosen to give the merge table realistic shape: common
English function words and suffixes win the early merges (th, he, in, er,
an, re, on, ...), then whole short words, then domain words the synthetic
documents actually contain — so encoding real corpus text genuinely
compresses (fewer tokens than characters, more than words).

Run:  python tests/fixtures/make_bpe_merges.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from gonova_document_parser_spark.spec.bpe import save_merges, train_bpe  # noqa: E402

N_MERGES = 200

# pinned training corpus: repeated function words + suffix-rich content
# words + the synthetic corpus' own vocabulary (see corpus.py word pools)
CORPUS = [
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "stays mainly in the plain and the cat sat on the mat with the hat",
    "a document extraction pipeline processes pages and documents into "
    "structured text with classification routing and extraction markers",
    "training data quality depends on deduplication filtering and "
    "contamination checks over the crawled corpus at web scale",
    "the reader reads the pages the writer writes the parser parses the "
    "tokens the counter counts the tokens in the documents",
    "running jumping walking talking thinking processing extracting "
    "computing counting routing merging splitting sampling",
    "international representation understanding transformation "
    "normalization canonicalization tokenization segmentation",
    "where there is a there and a then there is a that and a this and "
    "these and those with which and what and when and who",
    "page one page two page three page four page five section heading "
    "paragraph sentence word character byte token line block",
    "error processing page unable to extract content from the scanned "
    "document falling back to the ocr path for this page",
    "report quarterly revenue growth analysis summary statistics table "
    "figure chart appendix reference citation footnote",
    "she sells sea shells on the sea shore and the shells she sells are "
    "surely sea shells so if she sells shells on the shore",
    "to be or not to be that is the question whether it is nobler in the "
    "mind to suffer the slings and arrows of outrageous fortune",
    "over and over again the pattern repeats itself in the data and the "
    "model learns the pattern from the repeated data",
    "numbers like 100 and 2024 and 42 appear with punctuation, commas, "
    "periods. hyphens-too; colons: and (parentheses) appear!",
] * 3  # repetition sharpens pair counts without changing the argmax order

if __name__ == "__main__":
    merges = train_bpe(CORPUS, N_MERGES)
    out = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")
    save_merges(merges, out)
    print(f"wrote {len(merges)} merges to {out}")
