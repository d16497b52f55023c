"""Logger CSV widening + class_cond refusal (r1 VERDICT weak #8/#9)."""

import csv
import os

import pytest

from mm_diffusion_tpu import configs
from mm_diffusion_tpu.utils.logger import KVLogger


def test_csv_header_widens_with_new_keys(tmp_path):
    log = KVLogger(str(tmp_path), stdout=False)
    log.logkv("a", 1)
    log.dumpkvs()
    log.logkv("a", 2)
    log.logkv("b", 9)
    log.dumpkvs()
    log.logkv("b", 10)
    log.dumpkvs()
    with open(os.path.join(str(tmp_path), "progress.csv")) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["a", "b"]
    assert [r[0] for r in rows[1:]] == ["1.0", "2.0", ""]
    assert [r[1] for r in rows[1:]] == ["", "9.0", "10.0"]


def test_class_cond_refused_loudly():
    """The reference silently hard-wires num_classes=None for the MM model
    (multimodal_script_util.py:193); we refuse instead of silently ignoring."""
    with pytest.raises(NotImplementedError, match="class_cond"):
        configs.create_model_config(
            video_size="4,3,16,16", audio_size="1,1024", class_cond=True
        )
