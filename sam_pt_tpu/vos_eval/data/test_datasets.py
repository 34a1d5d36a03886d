"""VOS test dataset wrappers yielding VideoReaders.

Mirrors the reference dataset selection (sam_pt/vos_eval/data/test_datasets.py:
LongTestDataset, DAVISTestDataset, YouTubeVOSTestDataset (meta.json
required-frames handling), MOSETestDataset, BDD100KTestDataset).
"""
from __future__ import annotations

import json
import os
from os import path
from typing import Iterator, List, Optional

import numpy as np

from .video_reader import VideoReader


class _DatasetBase:
    vid_list: List[str]

    def __len__(self) -> int:
        return len(self.vid_list)

    def get_datasets(self) -> Iterator[VideoReader]:
        raise NotImplementedError


class LongTestDataset(_DatasetBase):
    """Generic frame-dir dataset (LV1/LV3/G modes)."""

    def __init__(self, data_root, size=-1, longest_size=None):
        self.image_dir = path.join(data_root, "JPEGImages")
        self.mask_dir = path.join(data_root, "Annotations")
        self.size = size
        self.longest_size = longest_size
        self.vid_list = sorted(os.listdir(self.image_dir))

    def get_datasets(self):
        for video in self.vid_list:
            yield VideoReader(
                video,
                path.join(self.image_dir, video),
                path.join(self.mask_dir, video),
                shortest_size=self.size,
                longest_size=self.longest_size,
                to_save=[
                    name[:-4]
                    for name in os.listdir(path.join(self.mask_dir, video))
                ],
            )


class DAVISTestDataset(_DatasetBase):
    def __init__(self, data_root, imset="2017/val.txt", size=-1,
                 longest_size=None, return_all_gt_masks=False):
        if size != 480:
            self.image_dir = path.join(data_root, "JPEGImages", "Full-Resolution")
            self.mask_dir = path.join(data_root, "Annotations", "Full-Resolution")
            if not path.exists(self.image_dir):
                print(f"{self.image_dir} not found. Looking at other options.")
                self.image_dir = path.join(data_root, "JPEGImages", "1080p")
                self.mask_dir = path.join(data_root, "Annotations", "1080p")
            if not path.exists(self.image_dir):
                # deviation from the reference (which asserts here): the
                # common DAVIS download ships only 480p — fall back to it
                # with a warning instead of crashing, so size=-1 +
                # longest_size (the default config) still runs
                print(f"{self.image_dir} not found either — falling back "
                      "to the 480p frames.")
                self.image_dir = path.join(data_root, "JPEGImages", "480p")
                self.mask_dir = path.join(data_root, "Annotations", "480p")
            assert path.exists(self.image_dir), "Path does not exist: {}".format(self.image_dir)
        else:
            self.image_dir = path.join(data_root, "JPEGImages", "480p")
            self.mask_dir = path.join(data_root, "Annotations", "480p")
        self.size_dir = path.join(data_root, "JPEGImages", "480p")
        self.size = size
        self.longest_size = longest_size
        self.return_all_gt_masks = return_all_gt_masks

        with open(path.join(data_root, "ImageSets", imset)) as f:
            self.vid_list = sorted([line.strip() for line in f if line.strip()])

    def get_datasets(self):
        for video in self.vid_list:
            yield VideoReader(
                video,
                path.join(self.image_dir, video),
                path.join(self.mask_dir, video),
                shortest_size=self.size,
                longest_size=self.longest_size,
                size_dir=path.join(self.size_dir, video),
                use_all_mask=self.return_all_gt_masks,
            )


class YouTubeVOSTestDataset(_DatasetBase):
    """YouTube-VOS: meta.json gives per-video objects + required save frames."""

    def __init__(self, data_root, split, size=480, longest_size=None):
        self.image_dir = path.join(data_root, "all_frames", split + "_all_frames",
                                   "JPEGImages")
        self.mask_dir = path.join(data_root, split, "Annotations")
        self.size = size
        self.longest_size = longest_size
        self.vid_list = sorted(os.listdir(self.image_dir))
        self.req_frame_list = {}

        with open(path.join(data_root, split, "meta.json")) as f:
            meta = json.load(f)["videos"]
            for vid, vmeta in meta.items():
                req_frames = []
                for obj in vmeta["objects"].values():
                    req_frames.extend(obj["frames"])
                self.req_frame_list[vid] = list(set(req_frames))

    def get_datasets(self):
        for video in self.vid_list:
            yield VideoReader(
                video,
                path.join(self.image_dir, video),
                path.join(self.mask_dir, video),
                shortest_size=self.size,
                longest_size=self.longest_size,
                to_save=self.req_frame_list.get(video),
                use_all_mask=True,
            )


class MOSETestDataset(_DatasetBase):
    def __init__(self, data_root, split="val", shortest_size=-1,
                 longest_size=None):
        self.image_dir = path.join(data_root, split, "JPEGImages")
        self.mask_dir = path.join(data_root, split, "Annotations")
        self.shortest_size = shortest_size
        self.longest_size = longest_size
        self.vid_list = sorted(os.listdir(self.image_dir))

    def get_datasets(self):
        for video in self.vid_list:
            yield VideoReader(
                video,
                path.join(self.image_dir, video),
                path.join(self.mask_dir, video),
                shortest_size=self.shortest_size,
                longest_size=self.longest_size,
                use_all_mask=True,
            )


class BDD100KTestDataset(_DatasetBase):
    def __init__(self, data_root, split="val", shortest_size=-1,
                 longest_size=None):
        self.image_dir = path.join(data_root, split, "JPEGImages")
        self.mask_dir = path.join(data_root, split, "Annotations")
        self.shortest_size = shortest_size
        self.longest_size = longest_size
        self.vid_list = sorted(os.listdir(self.image_dir))

    def get_datasets(self):
        for video in self.vid_list:
            yield VideoReader(
                video,
                path.join(self.image_dir, video),
                path.join(self.mask_dir, video),
                shortest_size=self.shortest_size,
                longest_size=self.longest_size,
                use_all_mask=True,
                mask_mode="P",
                mask_dtype=np.int16,
            )
