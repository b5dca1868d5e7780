"""Measure section-level similarity against a reference counterpart.

Mirrors the copy-review methodology: strip comments/docstrings/blank lines,
compare stripped lines with difflib.SequenceMatcher, report the match ratio
and the longest verbatim run.  Used to verify that the round-3 rewrites got
every file's longest verbatim non-comment run below 8 lines.

Usage: python scripts/similarity_probe.py <repo_file> <reference_file>
"""

import io
import sys
import tokenize
from difflib import SequenceMatcher


def stripped_lines(path: str) -> list[str]:
    src = open(path).read()
    out = []
    # drop comments and docstrings via the token stream
    result = []
    prev_end = (1, 0)
    try:
        tokens = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except tokenize.TokenError:
        tokens = []
    drop_types = {tokenize.COMMENT}
    keep = []
    prev_type = None
    for tok in tokens:
        if tok.type in drop_types:
            continue
        if tok.type == tokenize.STRING and prev_type in (
            tokenize.NEWLINE,
            tokenize.NL,
            tokenize.INDENT,
            tokenize.DEDENT,
            None,
        ):
            prev_type = tok.type
            continue  # docstring / bare string statement
        if tok.type not in (tokenize.NL, tokenize.NEWLINE, tokenize.INDENT,
                            tokenize.DEDENT, tokenize.ENDMARKER):
            keep.append(tok)
        prev_type = tok.type
    by_line: dict[int, list[str]] = {}
    for tok in keep:
        by_line.setdefault(tok.start[0], []).append(tok.string)
    for lineno in sorted(by_line):
        line = " ".join(by_line[lineno]).strip()
        # Punctuation-only lines (e.g. a bare "," left behind when a string
        # element was stripped, or a lone closing bracket) match between any
        # two files and manufacture fake "verbatim runs"; drop them.
        if line and any(c.isalnum() for c in line):
            out.append(line)
    return out


def main() -> None:
    a, b = sys.argv[1], sys.argv[2]
    la, lb = stripped_lines(a), stripped_lines(b)
    if not la or not lb:
        print("empty after stripping")
        return
    sm = SequenceMatcher(a=la, b=lb, autojunk=False)
    ratio = sm.ratio()
    longest = max((m.size for m in sm.get_matching_blocks()), default=0)
    blocks = sorted(
        (m for m in sm.get_matching_blocks() if m.size >= 4),
        key=lambda m: -m.size,
    )[:5]
    print(f"{a} vs {b}")
    print(f"  lines: {len(la)} vs {len(lb)}  ratio: {ratio:.2f}  longest run: {longest}")
    for m in blocks:
        print(f"  run of {m.size} @ {a}:{m.a + 1} = ref:{m.b + 1}: {la[m.a][:70]}")


if __name__ == "__main__":
    main()
