"""Match visualization (reference tools/utils.py:463-847 and
components/utils/evaluation_utils.py draw_match): side-by-side keypoint and
match rendering via OpenCV, host-side."""
from __future__ import annotations

import numpy as np


def draw_points(img, points, color=(0, 255, 0), radius: int = 3):
    import cv2

    img = img.copy()
    for p in np.asarray(points):
        cv2.circle(img, (int(p[0]), int(p[1])), radius=radius, color=color)
    return img


def draw_matches(img0, img1, kpts0, kpts1, matches, inliers=None,
                 color_in=(0, 255, 0), color_out=(0, 0, 255)):
    """matches: [M,2] index pairs; inliers: optional [M] bool mask."""
    import cv2

    img0 = np.atleast_3d(img0)
    img1 = np.atleast_3d(img1)
    if img0.shape[2] == 1:
        img0 = np.repeat(img0, 3, axis=2)
    if img1.shape[2] == 1:
        img1 = np.repeat(img1, 3, axis=2)
    h = max(img0.shape[0], img1.shape[0])
    w = img0.shape[1] + img1.shape[1]
    canvas = np.zeros((h, w, 3), np.uint8)
    canvas[: img0.shape[0], : img0.shape[1]] = img0
    canvas[: img1.shape[0], img0.shape[1]:] = img1
    off = img0.shape[1]
    matches = np.asarray(matches)
    if inliers is None:
        inliers = np.ones(len(matches), bool)
    for (i, j), ok in zip(matches, inliers):
        p0 = (int(kpts0[i][0]), int(kpts0[i][1]))
        p1 = (int(kpts1[j][0]) + off, int(kpts1[j][1]))
        cv2.line(canvas, p0, p1, color_in if ok else color_out, 1, cv2.LINE_AA)
    return canvas


def matches_from_indices0(indices0):
    """[N] matcher output (-1 unmatched) -> [M,2] index pairs."""
    indices0 = np.asarray(indices0)
    valid = indices0 > -1
    return np.stack([np.where(valid)[0], indices0[valid]], axis=1)


# --------------------------------------------------------------------------
# matplotlib figure suite (reference tools/utils.py:463-499, 737-847) —
# same API surface, reimplemented; matplotlib imported lazily so headless
# pipelines never pay for it.

def plot_image_pair(imgs, dpi=100, size=6, pad=0.5):
    """Two grayscale images side by side; returns (fig, axes)."""
    import matplotlib.pyplot as plt

    assert len(imgs) == 2, "number of images must be two"
    figsize = (size * 2, size * 3 / 4) if size is not None else None
    fig, ax = plt.subplots(1, 2, figsize=figsize, dpi=dpi)
    for a, im in zip(ax, imgs):
        a.imshow(im, cmap="gray", vmin=0, vmax=255)
        a.set_xticks([])
        a.set_yticks([])
        for spine in a.spines.values():
            spine.set_visible(False)
    fig.tight_layout(pad=pad)
    return fig, ax


def plot_keypoints(ax, kpts0, kpts1, color="w", ps=2):
    ax[0].scatter(kpts0[:, 0], kpts0[:, 1], c=color, s=ps)
    ax[1].scatter(kpts1[:, 0], kpts1[:, 1], c=color, s=ps)


def plot_matches_fig(fig, ax, mkpts0, mkpts1, color, lw=1.5, ps=4):
    """Figure-space match lines between the two axes (per-match colors)."""
    import matplotlib.lines

    fig.canvas.draw()
    inv = fig.transFigure.inverted()
    f0 = inv.transform(ax[0].transData.transform(mkpts0))
    f1 = inv.transform(ax[1].transData.transform(mkpts1))
    fig.lines = [
        matplotlib.lines.Line2D((f0[i, 0], f1[i, 0]), (f0[i, 1], f1[i, 1]),
                                zorder=1, transform=fig.transFigure,
                                c=color[i], linewidth=lw)
        for i in range(len(mkpts0))
    ]
    ax[0].scatter(mkpts0[:, 0], mkpts0[:, 1], c=color, s=ps)
    ax[1].scatter(mkpts1[:, 0], mkpts1[:, 1], c=color, s=ps)


def error_colormap(x):
    """Red (x=0) -> yellow -> green (x=1) RGBA ramp (reference
    tools/utils.py:850-852); callers pass x = 1 - error so correct matches
    render green."""
    x = np.asarray(x)
    return np.clip(np.stack(
        [2 - x * 2, x * 2, np.zeros_like(x), np.ones_like(x)], -1), 0, 1)


def make_matching_plot(image0, image1, kpts0, kpts1, mkpts0, mkpts1, color,
                       text=(), path=None, show_keypoints=False,
                       fast_viz=False, small_text=()):
    """Annotated match figure (reference tools/utils.py:737-773). color:
    [M, 4] RGBA per match (e.g. error_colormap(errors)). fast_viz routes to
    the cv2 canvas (returns the image array instead of saving a figure)."""
    if fast_viz:
        return make_matching_plot_fast(
            image0, image1, kpts0, kpts1, mkpts0, mkpts1, color, text=text,
            path=path, show_keypoints=show_keypoints, small_text=small_text)

    import matplotlib.pyplot as plt

    fig, ax = plot_image_pair([image0, image1])
    if show_keypoints:
        plot_keypoints(ax, kpts0, kpts1, color="k", ps=20)
        plot_keypoints(ax, kpts0, kpts1, color="r", ps=10)
    plot_matches_fig(fig, ax, mkpts0, mkpts1, color)

    img0 = np.asarray(image0)
    txt_color = "k" if img0[:100, :150].mean() > 200 else "w"
    fig.text(0.01, 0.99, "\n".join(text), transform=ax[0].transAxes,
             fontsize=15, va="top", ha="left", color=txt_color)
    txt_color = "k" if img0[-100:, :150].mean() > 200 else "w"
    fig.text(0.01, 0.01, "\n".join(small_text), transform=ax[0].transAxes,
             fontsize=5, va="bottom", ha="left", color=txt_color)
    if path is not None:
        fig.savefig(str(path), bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return fig


def make_matching_plot_fast(image0, image1, kpts0, kpts1, mkpts0, mkpts1,
                            color, text=(), path=None, show_keypoints=False,
                            margin=10, opencv_display=False,
                            opencv_title="matches", small_text=()):
    """cv2-only annotated match canvas (reference tools/utils.py:776-847):
    side-by-side grayscale pair with `margin` px separation, per-match RGBA
    colors, optional keypoint dots, headline text top-left and small text
    bottom-left. Returns the uint8 BGR canvas; the matplotlib-free path used
    for video/demo overlays."""
    import cv2

    image0 = np.asarray(image0)
    image1 = np.asarray(image1)
    h0, w0 = image0.shape[:2]
    h1, w1 = image1.shape[:2]
    h, w = max(h0, h1), w0 + w1 + margin
    out = 255 * np.ones((h, w), np.uint8)
    out[:h0, :w0] = image0 if image0.ndim == 2 else cv2.cvtColor(
        image0, cv2.COLOR_BGR2GRAY)
    out[:h1, w0 + margin:] = image1 if image1.ndim == 2 else cv2.cvtColor(
        image1, cv2.COLOR_BGR2GRAY)
    out = np.stack([out] * 3, -1)

    if show_keypoints:
        white, black = (255, 255, 255), (0, 0, 0)
        for x, y in np.round(kpts0).astype(int):
            cv2.circle(out, (x, y), 2, black, -1, lineType=cv2.LINE_AA)
            cv2.circle(out, (x, y), 1, white, -1, lineType=cv2.LINE_AA)
        for x, y in np.round(kpts1).astype(int):
            cv2.circle(out, (x + margin + w0, y), 2, black, -1,
                       lineType=cv2.LINE_AA)
            cv2.circle(out, (x + margin + w0, y), 1, white, -1,
                       lineType=cv2.LINE_AA)

    mkpts0 = np.round(np.asarray(mkpts0)).astype(int)
    mkpts1 = np.round(np.asarray(mkpts1)).astype(int)
    color = (np.asarray(color)[:, :3][:, ::-1] * 255).astype(int)  # RGBA->BGR
    for (x0, y0), (x1, y1), c in zip(mkpts0, mkpts1, color):
        c = c.tolist()
        cv2.line(out, (x0, y0), (x1 + margin + w0, y1), color=c, thickness=1,
                 lineType=cv2.LINE_AA)
        cv2.circle(out, (x0, y0), 2, c, -1, lineType=cv2.LINE_AA)
        cv2.circle(out, (x1 + margin + w0, y1), 2, c, -1,
                   lineType=cv2.LINE_AA)

    sc = min(h / 640.0, 2.0)  # text scale relative to a 640px-high canvas
    ht = int(30 * sc)
    for i, t in enumerate(text):
        cv2.putText(out, t, (int(8 * sc), ht * (i + 1)),
                    cv2.FONT_HERSHEY_DUPLEX, 1.0 * sc, (0, 0, 0), 2,
                    cv2.LINE_AA)
        cv2.putText(out, t, (int(8 * sc), ht * (i + 1)),
                    cv2.FONT_HERSHEY_DUPLEX, 1.0 * sc, (255, 255, 255), 1,
                    cv2.LINE_AA)
    hs = int(18 * sc)
    for i, t in enumerate(reversed(small_text)):
        cv2.putText(out, t, (int(8 * sc), int(h - hs * (i + 0.6))),
                    cv2.FONT_HERSHEY_DUPLEX, 0.5 * sc, (0, 0, 0), 2,
                    cv2.LINE_AA)
        cv2.putText(out, t, (int(8 * sc), int(h - hs * (i + 0.6))),
                    cv2.FONT_HERSHEY_DUPLEX, 0.5 * sc, (255, 255, 255), 1,
                    cv2.LINE_AA)

    if path is not None:
        cv2.imwrite(str(path), out)
    if opencv_display:
        cv2.imshow(opencv_title, out)
        cv2.waitKey(1)
    return out


def eval_matches(pred_matches, gt_matches):
    """Inlier ratio of predicted matches + recall vs GT (reference
    tools/utils.py:855-878), vectorized: pred_matches [N,2] index pairs,
    gt_matches [K] with -1 = unmatched."""
    pred_matches = np.asarray(pred_matches).reshape(-1, 2)
    gt_matches = np.asarray(gt_matches)
    if len(pred_matches):
        correct = gt_matches[pred_matches[:, 0]] == pred_matches[:, 1]
        n_corr = int(np.sum(correct & (gt_matches[pred_matches[:, 0]] != -1)))
    else:
        n_corr = 0
    n_pred = len(pred_matches)
    n_gt = int(np.sum(gt_matches != -1))
    return {
        "inlier_ratio": n_corr / n_pred if n_pred > 0 else 0,
        "recall_ratio": n_corr / n_gt if n_gt > 0 else 0,
    }
