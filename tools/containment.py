#!/usr/bin/env python
"""Token 5-gram containment of a repo file in reference file(s).

Usage: python tools/containment.py <repo_file> <ref_file> [<ref_file>...]

Mirrors the judge's similarity diagnostic: tokenize (python tokens,
identifiers/numbers/strings as-is), build 5-gram sets, report
|repo ∩ ref| / |repo|.
"""

import io
import sys
import tokenize


def tokens(path):
    out = []
    with open(path, "rb") as f:
        try:
            for tok in tokenize.tokenize(f.readline):
                if tok.type in (tokenize.COMMENT, tokenize.NL, tokenize.NEWLINE,
                                tokenize.INDENT, tokenize.DEDENT,
                                tokenize.ENCODING, tokenize.ENDMARKER):
                    continue
                out.append(tok.string)
        except tokenize.TokenError:
            pass
    return out


def ngrams(toks, n=5):
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def main():
    repo = ngrams(tokens(sys.argv[1]))
    ref = set()
    for path in sys.argv[2:]:
        ref |= ngrams(tokens(path))
    if not repo:
        print("no repo 5-grams")
        return
    inter = len(repo & ref)
    print(f"{sys.argv[1]}: {100.0 * inter / len(repo):.1f}% "
          f"({inter}/{len(repo)} 5-grams contained)")


if __name__ == "__main__":
    main()
