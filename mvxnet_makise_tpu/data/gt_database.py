"""GT-sample database: offline build + in-RAM load.

Reference: /root/reference/create_gtdatabase.py and
modules/augment/LoadGT.py (SURVEY.md §2 C6).  The builder matches KITTI
3D labels with KINS amodal-segmentation masks by 2D IoU >= 0.65, crops
each object's points with its oriented 3D box, and stores per-object
(velo .bin, masked image patch, mask .npy) plus a ``gtinfo.pkl`` index.

Implementation notes (this environment has no pycocotools/open3d):
  * COCO-style polygon segmentation decodes via cv2.fillPoly;
    uncompressed RLE via numpy cumsum — no external mask library;
  * the oriented-box point crop is three dot products
    (geometry.boxes_np.points_in_box3d) instead of Open3D;
  * ``build_database(..., kins_json=None)`` additionally supports a
    KINS-free mode that uses the KITTI 2D box as a rectangular mask, so
    augmentation works on a bare KITTI tree (the reference hard-requires
    KINS).

The on-disk layout matches the reference
(``training/gtdatabase/<cls>/{velo,img,mask}_NNNNNN.*`` + gtinfo.pkl), so
databases interchange between frameworks.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.kitti import KittiPaths, read_labels, read_split
from mvxnet_makise_tpu.geometry.boxes import boxes_cam_to_lidar
from mvxnet_makise_tpu.geometry.boxes_np import points_in_box3d
from mvxnet_makise_tpu.geometry.calib import read_calib

KINS_CLASS_IDS = {"Cyclist": 1, "Pedestrian": 2, "Car": 4}


def polygons_to_mask(segm, height: int, width: int) -> np.ndarray:
    """COCO-style segmentation -> uint8 {0,1} mask.

    Accepts polygon lists ([[x0, y0, x1, y1, ...], ...]) or an
    uncompressed RLE dict ({'counts': [...], 'size': [h, w]}).
    """
    import cv2 as cv

    if isinstance(segm, dict):
        counts = segm["counts"]
        h, w = segm["size"]
        if isinstance(counts, (bytes, str)):
            raise ValueError("compressed RLE unsupported; expected "
                             "polygon or uncompressed RLE")
        flat = np.zeros(h * w, dtype=np.uint8)
        pos = 0
        val = 0
        for run in counts:
            if val:
                flat[pos:pos + run] = 1
            pos += run
            val ^= 1
        # COCO RLE is column-major
        return flat.reshape((w, h)).T[:height, :width]

    mask = np.zeros((height, width), dtype=np.uint8)
    polys = [np.asarray(p, dtype=np.float64).reshape(-1, 2).astype(np.int32)
             for p in segm if len(p) >= 6]
    if polys:
        cv.fillPoly(mask, polys, 1)
    return mask


def _iou_2d(b1: np.ndarray, b2: np.ndarray) -> np.ndarray:
    """Pairwise xyxy IoU."""
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None, :] - inter, 1e-9)


def _load_kins_index(kins_json: str):
    """KINS 2020 json -> (image_id -> file name, image_id -> [ann])."""
    with open(kins_json, "r") as f:
        info = json.load(f)
    imgs = {im["id"]: im["file_name"] for im in info["images"]}
    anns: Dict[int, list] = {}
    for ann in info["annotations"]:
        anns.setdefault(ann["image_id"], []).append(ann)
    return imgs, anns


def build_database(root: str, cfg: Config,
                   kins_json: Optional[str] = None,
                   classes: Sequence[str] = ("Car", "Pedestrian", "Cyclist"),
                   limit: Optional[int] = None) -> Dict[str, int]:
    """Build training/gtdatabase from the train split.

    With ``kins_json``: KINS inmodal masks matched to KITTI labels at 2D
    IoU >= 0.65 (reference create_gtdatabase.py:182-189).  Without: every
    in-range labelled object is taken with a rectangular mask.
    Returns per-class sample counts.
    """
    import cv2 as cv

    paths = KittiPaths.from_root(root)
    gtroot = os.path.join(root, "training", "gtdatabase")
    os.makedirs(gtroot, exist_ok=True)
    for c in classes:
        os.makedirs(os.path.join(gtroot, c), exist_ok=True)

    train_ids = read_split(paths.train_split)
    if limit:
        train_ids = train_ids[:limit]
    train_set = set(train_ids)

    kins = None
    if kins_json is not None:
        imgs, anns = _load_kins_index(kins_json)
        kins = {}
        for img_id, fname in imgs.items():
            fid = os.path.splitext(os.path.basename(fname))[0][:6]
            if fid in train_set:
                kins[fid] = anns.get(img_id, [])

    gtinfo: Dict[str, List[dict]] = {c: [] for c in classes}
    counters = {c: 0 for c in classes}
    im_h, im_w = cfg.image_size

    frame_ids = sorted(kins.keys()) if kins is not None else train_ids
    for fid in frame_ids:
        img = cv.imread(os.path.join(paths.image, fid + ".png"))
        if img is None:
            continue
        full_h, full_w = img.shape[:2]
        img = img[:im_h, :im_w]

        velo_dir = paths.velodyne_cropped if os.path.isdir(
            paths.velodyne_cropped) else paths.velodyne
        velo = np.fromfile(os.path.join(velo_dir, fid + ".bin"),
                           dtype=np.float32).reshape(-1, 4)
        calib = read_calib(os.path.join(paths.calib, fid + ".txt"))
        c2v = np.linalg.inv(np.asarray(calib.velo_to_cam))
        labels = read_labels(os.path.join(paths.label, fid + ".txt"))

        lo = np.asarray(cfg.velo_range[:3], np.float32)
        hi = np.asarray(cfg.velo_range[3:6], np.float32)

        for cls in classes:
            sel = labels["type"] == cls
            if not np.any(sel):
                continue
            cam = labels["cam_box"][sel]
            b2d = labels["bbox2d"][sel]
            occ = labels["occluded"][sel]
            lidar = np.asarray(
                boxes_cam_to_lidar(cam, c2v), np.float32)
            in_range = np.all(
                (lidar[:, :3] >= lo) & (lidar[:, :3] < hi), axis=1)
            lidar, b2d, occ = lidar[in_range], b2d[in_range], occ[in_range]
            if len(lidar) == 0:
                continue

            if kins is not None:
                cls_id = KINS_CLASS_IDS[cls]
                cls_anns = [a for a in kins[fid]
                            if a["category_id"] == cls_id]
                if not cls_anns:
                    continue
                mask_boxes = []
                for a in cls_anns:
                    x, y, w, h = a["a_bbox"]
                    mask_boxes.append([x, y, x + w, y + h])
                mask_boxes = np.asarray(mask_boxes, np.float32)
                ious = _iou_2d(b2d, mask_boxes)
                best = ious.argmax(axis=1)
                ok = ious[np.arange(len(b2d)), best] >= 0.65
            else:
                best = np.zeros(len(b2d), dtype=int)
                ok = np.ones(len(b2d), dtype=bool)

            for gi in np.nonzero(ok)[0]:
                box3d, box2d = lidar[gi], b2d[gi]
                if kins is not None:
                    ann = cls_anns[best[gi]]
                    mask = polygons_to_mask(
                        ann.get("i_segm") or ann.get("segmentation"),
                        full_h, full_w)[:im_h, :im_w]
                    x, y, w, h = ann["a_bbox"]
                    mb = np.asarray([x, y, x + w, y + h], np.int32)
                else:
                    mb = box2d.astype(np.int32)
                    mask = np.zeros((im_h, im_w), np.uint8)
                    mask[mb[1]:mb[3] + 1, mb[0]:mb[2] + 1] = 1
                mb = np.clip(mb, 0, [im_w - 1, im_h - 1,
                                     im_w - 1, im_h - 1])
                roi_mask = mask[mb[1]:mb[3] + 1, mb[0]:mb[2] + 1]
                roi_img = img[mb[1]:mb[3] + 1, mb[0]:mb[2] + 1] \
                    * roi_mask[..., None]
                if roi_img.size == 0:
                    continue

                inside = points_in_box3d(velo, box3d)
                obj_velo = velo[inside]

                k = counters[cls]
                veloname = f"velo_{k:06d}.bin"
                imgname = f"img_{k:06d}.png"
                maskname = f"mask_{k:06d}.npy"
                cdir = os.path.join(gtroot, cls)
                obj_velo.astype(np.float32).tofile(
                    os.path.join(cdir, veloname))
                cv.imwrite(os.path.join(cdir, imgname), roi_img)
                np.save(os.path.join(cdir, maskname), roi_mask)
                gtinfo[cls].append({
                    "velo": veloname, "image": imgname, "mask": maskname,
                    "occlude": float(occ[gi]), "maskbbox": mb,
                    "bbox2d": box2d.astype(np.float32),
                    "bbox3d": box3d.astype(np.float32), "id": fid,
                })
                counters[cls] += 1

    with open(os.path.join(gtroot, "gtinfo.pkl"), "wb") as f:
        pickle.dump(gtinfo, f)
    return counters


def load_database(root: str,
                  classes: Sequence[str]) -> Dict[str, List[dict]]:
    """Load the whole database into RAM (reference LoadGT.getAllGT,
    LoadGT.py:34-56).  Each sample dict carries velo/image/mask arrays
    plus boxes and the source frame's calib."""
    import cv2 as cv

    paths = KittiPaths.from_root(root)
    gtroot = os.path.join(root, "training", "gtdatabase")
    with open(os.path.join(gtroot, "gtinfo.pkl"), "rb") as f:
        gtinfo = pickle.load(f)

    out: Dict[str, List[dict]] = {}
    calib_cache = {}
    for cls in classes:
        samples = []
        for info in gtinfo.get(cls, []):
            cdir = os.path.join(gtroot, cls)
            velo = np.fromfile(os.path.join(cdir, info["velo"]),
                               dtype=np.float32).reshape(-1, 4)
            img = cv.imread(os.path.join(cdir, info["image"]))
            mask = np.load(os.path.join(cdir, info["mask"]))
            fid = info["id"]
            if fid not in calib_cache:
                calib_cache[fid] = read_calib(
                    os.path.join(paths.calib, fid + ".txt"))
            samples.append({
                "velo": velo, "image": img, "mask": mask,
                "maskbbox": np.asarray(info["maskbbox"], np.int32),
                "bbox2d": np.asarray(info["bbox2d"], np.float32),
                "bbox3d": np.asarray(info["bbox3d"], np.float32),
                "calib": calib_cache[fid],
            })
        out[cls] = samples
    return out
