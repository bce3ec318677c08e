"""Committed AOT artifacts must match the working tree (VERDICT r4 #4).

bench.py's program identity hashes every ``tpu_darktable/*.py`` source
file, so ANY package source change strands the committed artifacts under
``artifacts/aot/`` - and a driver bench run on a fresh host then degrades
to a cold XLA-only ladder at best (the Mosaic-bearing FULL/FULLFAST rungs
are artifact-gated and simply skip).  This is the counterpart of the
reference's install-time compilation contract (reference setup.py:9-38:
the extension is always built before first use).

The check is loud-skip by default so the suite stays usable mid-edit;
the round-end gate runs it strictly:

    TD_REQUIRE_ARTIFACTS=1 python -m pytest tests/test_artifact_freshness.py

after ``python bench.py --build-artifacts`` has re-serialized the rungs.
"""

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

import bench

_REPO = Path(bench.__file__).resolve().parent
_AOT_DIR = _REPO / 'artifacts' / 'aot'


def _missing_rungs():
    from tpu_darktable.utils import aot

    identity = bench._identity()
    missing = []
    for name in bench._ARTIFACT_GATED:
        pid = bench._program_identity(identity, name)
        if not (_AOT_DIR / f'{aot.aot_key(pid)}.aotexe').exists():
            missing.append(name)
    return missing


def test_committed_artifacts_match_working_tree():
    missing = _missing_rungs()
    if not missing:
        return
    msg = (
        f'committed AOT artifacts are STALE for rungs {missing}: the '
        f'working tree\'s program identity ({bench._identity()[:12]}...) has '
        f'no matching .aotexe under {_AOT_DIR}.  A driver bench run would '
        f'skip the artifact-gated flagship.  Rebuild with '
        f'`python bench.py --build-artifacts` (on the TPU host) and commit '
        f'the new artifacts before round end.'
    )
    if os.environ.get('TD_REQUIRE_ARTIFACTS') == '1':
        pytest.fail(msg)
    pytest.skip(msg)
