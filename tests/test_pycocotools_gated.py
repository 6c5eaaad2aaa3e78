"""Cross-check the self-authored CocoEvaluator against the REAL pycocotools.

pycocotools is not installable in the build environment (zero network
egress), so these tests auto-skip here — they are ARMED for the day a
deployment environment provides the library: the moment
`import pycocotools` works, the same randomized scenes the literal
transcription validated (tests/test_coco_eval_differential.py) run through
the real COCOeval, externally validating every mAP this framework will
publish. (Reference oracle usage: tools/val.py:236-248.)
"""

import sys
from pathlib import Path

import numpy as np
import pytest

pytest.importorskip("pycocotools")

sys.path.insert(0, str(Path(__file__).parent))
from test_coco_eval_differential import _random_scene

from leanyolo_tpu.utils.coco_eval import CocoEvaluator, pycocotools_stats


@pytest.mark.parametrize("seed,hard", [(s, False) for s in range(8)] + [(s, True) for s in range(20, 26)])
def test_matches_real_pycocotools(seed, hard):
    rng = np.random.RandomState(seed)
    gt, results = _random_scene(rng, n_imgs=4, n_cats=3, hard=hard)
    want = pycocotools_stats(gt, results)
    assert want is not None
    ours = CocoEvaluator(gt)
    ours.add_detections(results)
    got = ours.evaluate()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-10), (seed, hard, k, got[k], want[k])


def test_matches_real_pycocotools_empty():
    rng = np.random.RandomState(0)
    gt, _ = _random_scene(rng, n_imgs=2, n_cats=2, hard=False)
    want = pycocotools_stats(gt, [])
    ours = CocoEvaluator(gt)
    got = ours.evaluate()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-10), k
