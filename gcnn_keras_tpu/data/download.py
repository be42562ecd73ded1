"""Dataset download/extract helper (parity: ``kgcnn/data/download.py:14``
DownloadDataset): fetch to ``~/.gcnn_keras_tpu/datasets``, unpack
zip/tar/gz, with an offline-friendly cache check.

Cache semantics mirror the reference's ``download_dataset_to_disk``
(``kgcnn/data/download.py:90-120``): the archive is fetched only when
missing (or ``reload=True``), and each unpack step is skipped when its
output already exists unless ``reload`` forces a re-extract. ``file://``
URLs work, so the whole flow is exercised offline against locally
synthesized archives (tests/test_data_layer.py)."""
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
                 extract_file_name: Optional[str] = None,
                 reload: bool = False, data_main_dir: Optional[str] = None,
                 **kwargs):
        self.dataset_name = dataset_name
        self.download_url = download_url
        self.download_file_name = download_file_name
        self.data_main_dir = data_main_dir or DATASET_ROOT
        self.data_directory_name = dataset_name
        self.data_directory = os.path.join(self.data_main_dir, dataset_name)
        self.unpack_directory_name = unpack_directory_name
        self.extract_file_name = extract_file_name
        os.makedirs(self.data_directory, exist_ok=True)
        if download_url and download_file_name:
            path = os.path.join(self.data_directory, download_file_name)
            if reload or not os.path.exists(path):
                self._download(download_url, path)
            if unpack_tar and os.path.exists(path):
                self._untar(path, unpack_directory_name, reload)
            if unpack_zip and os.path.exists(path):
                self._unzip(path, unpack_directory_name, reload)
            if extract_gz and os.path.exists(path):
                self._gunzip(path, extract_file_name, reload)

    def _download(self, url: str, path: str):
        import urllib.request
        logger.info("downloading %s -> %s", url, path)
        try:
            urllib.request.urlretrieve(url, path)
        except Exception as e:  # offline environments: defer, don't crash
            logger.warning("download failed (%s); place the file at %s manually",
                           e, path)

    def _untar(self, path: str, out_name: Optional[str], reload: bool):
        out = os.path.join(self.data_directory, out_name) if out_name \
            else self.data_directory
        if out_name and os.path.isdir(out) and not reload:
            logger.info("unpacked directory %s exists; skipping untar", out)
            return
        with tarfile.open(path) as tar:
            # 'data' filter = safe extraction (no abs paths/links outside
            # the target); also the 3.14 default. The kwarg only exists
            # from 3.10.12/3.11.4/3.12 — fall back on older patch levels.
            try:
                tar.extractall(out, filter="data")
            except TypeError:
                tar.extractall(out)

    def _unzip(self, path: str, out_name: Optional[str], reload: bool):
        out = os.path.join(self.data_directory, out_name) if out_name \
            else self.data_directory
        if out_name and os.path.isdir(out) and not reload:
            logger.info("unpacked directory %s exists; skipping unzip", out)
            return
        with zipfile.ZipFile(path) as z:
            z.extractall(out)

    def _gunzip(self, path: str, out_name: Optional[str], reload: bool):
        import gzip
        out = os.path.join(self.data_directory, out_name) if out_name \
            else (path[:-3] if path.endswith(".gz") else path + ".out")
        if os.path.exists(out) and not reload:
            logger.info("extracted file %s exists; skipping gunzip", out)
            return
        with gzip.open(path, "rb") as f_in, open(out, "wb") as f_out:
            shutil.copyfileobj(f_in, f_out)
