"""Dataset acquisition (reference
`utils/download_and_unzip_datasets.csh:28-53`): VQA v2 annotations +
questions and MS-COCO image zips. This environment has no network egress;
`urls()` returns the list and `download()` fetches + unzips when run
somewhere with connectivity.
"""

from __future__ import annotations

import os
import urllib.request
import zipfile
from typing import Dict, List

VQA_URLS: Dict[str, List[str]] = {
    "Annotations": [
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Annotations_Train_mscoco.zip",
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Annotations_Val_mscoco.zip",
    ],
    "Questions": [
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Questions_Train_mscoco.zip",
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Questions_Val_mscoco.zip",
        "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/"
        "v2_Questions_Test_mscoco.zip",
    ],
    "Images": [
        "http://images.cocodataset.org/zips/train2014.zip",
        "http://images.cocodataset.org/zips/val2014.zip",
        "http://images.cocodataset.org/zips/test2015.zip",
    ],
}


def urls() -> List[str]:
    return [u for group in VQA_URLS.values() for u in group]


def download(output_dir: str, groups=("Annotations", "Questions",
                                      "Images")) -> None:
    for group in groups:
        dest = os.path.join(output_dir,
                            group if group != "Images" else "")
        os.makedirs(dest or output_dir, exist_ok=True)
        for url in VQA_URLS[group]:
            zip_path = os.path.join(dest or output_dir,
                                    os.path.basename(url))
            if not os.path.exists(zip_path):
                print(f"downloading {url}")
                urllib.request.urlretrieve(url, zip_path)
            print(f"unzipping {zip_path}")
            with zipfile.ZipFile(zip_path) as zf:
                zf.extractall(dest or output_dir)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", type=str, default="data/vqa")
    p.add_argument("--list_only", action="store_true")
    args = p.parse_args()
    if args.list_only:
        print("\n".join(urls()))
    else:
        download(args.output_dir)
