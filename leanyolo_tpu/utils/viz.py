"""Detection visualization (host-side, cv2).

Parity: leanyolo/utils/viz.py:17-41 — boxes with "name (id) pct%" labels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def draw_detections(
    img_bgr: np.ndarray,
    dets: np.ndarray,
    class_names: Optional[Sequence[str]] = None,
    *,
    color=(0, 255, 0),
    thickness: int = 2,
) -> np.ndarray:
    """Draw [N, 6] detections ([x1, y1, x2, y2, score, cls]) on a BGR image."""
    import cv2

    out = img_bgr.copy()
    for det in np.asarray(dets):
        x1, y1, x2, y2, score, cls = det[:6]
        cls = int(cls)
        p1 = (int(round(x1)), int(round(y1)))
        p2 = (int(round(x2)), int(round(y2)))
        cv2.rectangle(out, p1, p2, color, thickness)
        name = class_names[cls] if class_names and 0 <= cls < len(class_names) else str(cls)
        label = f"{name} ({cls}) {score * 100:.0f}%"
        (tw, th), baseline = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        ty = max(p1[1] - 4, th + 2)
        cv2.rectangle(out, (p1[0], ty - th - 2), (p1[0] + tw + 2, ty + baseline - 2), color, -1)
        cv2.putText(out, label, (p1[0] + 1, ty - 2), cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 0, 0), 1, cv2.LINE_AA)
    return out
