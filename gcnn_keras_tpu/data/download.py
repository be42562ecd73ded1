"""Dataset download/extract helper (parity: ``kgcnn/data/download.py:14``
DownloadDataset): fetch to ``~/.gcnn_keras_tpu/datasets``, unpack
zip/tar/gz, with an offline-friendly cache check."""
from __future__ import annotations

import logging
import os
import shutil
import tarfile
import zipfile
from typing import Optional

logger = logging.getLogger(__name__)

DATASET_ROOT = os.path.expanduser("~/.gcnn_keras_tpu/datasets")


class DownloadDataset:
    def __init__(self, dataset_name: str, download_url: Optional[str] = None,
                 download_file_name: Optional[str] = None,
                 unpack_tar: bool = False, unpack_zip: bool = False,
                 unpack_directory_name: Optional[str] = None,
                 extract_gz: bool = False,
                 reload: bool = False, **kwargs):
        self.dataset_name = dataset_name
        self.download_url = download_url
        self.download_file_name = download_file_name
        self.data_main_dir = DATASET_ROOT
        self.data_directory_name = dataset_name
        self.data_directory = os.path.join(DATASET_ROOT, dataset_name)
        os.makedirs(self.data_directory, exist_ok=True)
        if download_url and download_file_name:
            path = os.path.join(self.data_directory, download_file_name)
            if reload or not os.path.exists(path):
                self._download(download_url, path)
            if unpack_tar and os.path.exists(path):
                self._untar(path, unpack_directory_name)
            if unpack_zip and os.path.exists(path):
                self._unzip(path, unpack_directory_name)
            if extract_gz and os.path.exists(path):
                self._gunzip(path)

    def _download(self, url: str, path: str):
        import urllib.request
        logger.info("downloading %s -> %s", url, path)
        try:
            urllib.request.urlretrieve(url, path)
        except Exception as e:  # offline environments: defer, don't crash
            logger.warning("download failed (%s); place the file at %s manually",
                           e, path)

    def _untar(self, path: str, out_name: Optional[str]):
        out = os.path.join(self.data_directory, out_name or "")
        with tarfile.open(path) as tar:
            tar.extractall(out or self.data_directory)

    def _unzip(self, path: str, out_name: Optional[str]):
        out = os.path.join(self.data_directory, out_name or "")
        with zipfile.ZipFile(path) as z:
            z.extractall(out or self.data_directory)

    def _gunzip(self, path: str):
        import gzip
        with gzip.open(path, "rb") as f_in, open(path[:-3], "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
