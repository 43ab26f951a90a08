#!/usr/bin/env python
"""Sweep token 5-gram containment of every urh_tpu source file against the
entire reference corpus (all .py/.pyx/.pxd under /root/reference/src).

Usage: python tools/containment_sweep.py [threshold_pct]
Prints files above the threshold (default 35%), sorted descending.
"""

import pathlib
import sys
import tokenize

N = 5


def tokens(path):
    out = []
    try:
        with open(path, "rb") as f:
            for tok in tokenize.tokenize(f.readline):
                if tok.type in (tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE,
                                tokenize.INDENT, tokenize.DEDENT,
                                tokenize.ENCODING, tokenize.ENDMARKER):
                    continue
                out.append(tok.string)
    except (tokenize.TokenError, SyntaxError, UnicodeDecodeError):
        # .pyx/.pxd files tokenize mostly fine; fall back to whatever we got
        pass
    return out


def ngrams(toks):
    return {tuple(toks[i:i + N]) for i in range(len(toks) - N + 1)}


def main():
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 35.0
    ref_root = pathlib.Path("/root/reference/src")
    ref = set()
    for ext in ("*.py", "*.pyx", "*.pxd"):
        for p in ref_root.rglob(ext):
            # skip generated Qt resource/ui monsters: useless and huge
            if p.name.endswith("_rc.py") or p.name.startswith("ui_"):
                continue
            ref |= ngrams(tokens(p))

    rows = []
    for p in sorted(pathlib.Path("urh_tpu").rglob("*.py")):
        toks = tokens(p)
        grams = ngrams(toks)
        if len(grams) < 50:
            continue
        inter = len(grams & ref)
        pct = 100.0 * inter / len(grams)
        rows.append((pct, str(p), inter, len(grams)))

    rows.sort(reverse=True)
    for pct, path, inter, total in rows:
        if pct >= threshold:
            print(f"{pct:5.1f}%  {path}  ({inter}/{total})")


if __name__ == "__main__":
    main()
