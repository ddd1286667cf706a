"""Data pipeline: VOC/COCO/synthetic datasets, transforms, loader."""

from .augmentation import (CLAHE, HorizontalFlip, HueSaturationValue,
                           LongestMaxSize, OneOf, PadIfNeeded,
                           RandomBrightnessContrast, RandomFlip, RandomGamma,
                           RandomResizedCrop, RGBShift, SquareResize,
                           Transpose, VerticalFlip, get_augmentation)
from .coco import CocoDataset
from .loader import DataLoader, shard_batch
from .synthetic import SyntheticDetection
from .transforms import (Augmenter, Compose, Normalizer,
                         PhotometricAugmenter, Resizer, collate,
                         eval_transforms, pad_annotations, train_transforms)
from .voc import VOC_CLASSES, VOCDetection, parse_voc_xml

__all__ = [
    "CocoDataset", "DataLoader", "shard_batch", "SyntheticDetection",
    "Augmenter", "Compose", "Normalizer", "PhotometricAugmenter", "Resizer",
    "collate", "eval_transforms", "pad_annotations", "train_transforms",
    "VOC_CLASSES", "VOCDetection", "parse_voc_xml",
    "CLAHE", "HorizontalFlip", "HueSaturationValue", "LongestMaxSize",
    "OneOf", "PadIfNeeded", "RandomBrightnessContrast", "RandomFlip",
    "RandomGamma", "RandomResizedCrop", "RGBShift", "SquareResize",
    "Transpose", "VerticalFlip", "get_augmentation",
]
