"""docs/PARITY.md (the SURVEY §2 audit matrix) must stay truthful: every
repo path it cites in backticks must exist, and every test file it names
must be a real test module."""
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cited_paths():
    text = open(os.path.join(REPO, "docs", "PARITY.md")).read()
    # backticked tokens that look like repo file paths
    for tok in re.findall(r"`([A-Za-z0-9_./]+\.py)`", text):
        yield tok


@pytest.mark.smoke
def test_parity_matrix_paths_exist():
    # all python basenames in the repo (bare names like `setup.py` in the
    # prose refer to the reference or are cited next to their full path)
    basenames = set()
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [d for d in dirs if not d.startswith(".")]
        basenames.update(f for f in files if f.endswith(".py"))
    missing = []
    for tok in set(_cited_paths()):
        if "/" not in tok:
            # bare test modules must live in tests/; other bare names may
            # be cited next to their full path or refer to the reference
            # (setup.py)
            if tok.startswith("test_"):
                if not os.path.exists(os.path.join(REPO, "tests", tok)):
                    missing.append(tok)
            elif tok not in basenames and tok != "setup.py":
                missing.append(tok)
            continue
        # slashed paths resolve EXACTLY, repo-relative or package-relative
        if not (os.path.exists(os.path.join(REPO, tok))
                or os.path.exists(os.path.join(REPO, "gcnn_keras_tpu", tok))):
            missing.append(tok)
    assert not missing, f"PARITY.md cites nonexistent paths: {sorted(missing)}"
