"""HF-style cache layer (ref: file_utils.py) — offline-capable paths."""
import json
import os

import pytest

from curriculum_learning_for_vln_tpu.models.file_utils import (
    cached_path, filename_to_url, get_file_extension, get_from_cache,
    read_set_from_file, split_s3_path, url_to_filename)


def test_url_to_filename_etag_changes_name():
    a = url_to_filename("https://x/y.bin")
    b = url_to_filename("https://x/y.bin", etag='"abc"')
    assert a != b and a == url_to_filename("https://x/y.bin")
    assert len(a) == 64 and len(b) == 129


def test_local_path_passthrough(tmp_path):
    p = tmp_path / "w.npz"
    p.write_bytes(b"123")
    assert cached_path(str(p)) == str(p)
    with pytest.raises(FileNotFoundError):
        cached_path(str(tmp_path / "missing.bin"))


def test_file_url_caches_and_roundtrips_metadata(tmp_path):
    src = tmp_path / "ckpt.bin"
    src.write_bytes(b"checkpoint-bytes")
    cache = tmp_path / "cache"
    url = src.as_uri()

    out = cached_path(url, cache_dir=str(cache))
    assert os.path.dirname(out) == str(cache)
    assert open(out, "rb").read() == b"checkpoint-bytes"
    # sidecar metadata recovers the url (reference filename_to_url contract)
    got_url, etag = filename_to_url(os.path.basename(out), cache_dir=str(cache))
    assert got_url == url and etag

    # second resolution is a cache hit (same path, no new files)
    n_before = len(os.listdir(cache))
    assert cached_path(url, cache_dir=str(cache)) == out
    assert len(os.listdir(cache)) == n_before

    # content change -> new etag -> new cache entry
    src.write_bytes(b"different")
    out2 = cached_path(url, cache_dir=str(cache))
    assert out2 != out and open(out2, "rb").read() == b"different"


def test_split_s3_path():
    assert split_s3_path("s3://bucket/a/b.bin") == ("bucket", "a/b.bin")
    with pytest.raises(ValueError):
        split_s3_path("s3://bucketonly")


def test_misc_helpers(tmp_path):
    f = tmp_path / "set.txt"
    f.write_text("alpha\nbeta\n")
    assert read_set_from_file(str(f)) == {"alpha", "beta"}
    assert get_file_extension("A/B.BIN") == ".bin"
    assert get_file_extension("a/b.bin", dot=False) == "bin"


def test_vlnbert_from_pretrained_torch_roundtrip(tmp_path):
    """cached_path + torch state_dict load + conversion in one call
    (the reference's from_pretrained flow, vilbert.py:1049-1254)."""
    import jax
    import numpy as np
    import torch

    from curriculum_learning_for_vln_tpu.models.vilbert import (VilBertConfig,
                                                                vlnbert_from_pretrained)

    cfg = VilBertConfig(
        vocab_size=32, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, max_position_embeddings=16, v_feature_size=16,
        v_target_size=4, v_hidden_size=16, v_num_hidden_layers=1,
        v_num_attention_heads=2, v_intermediate_size=32, bi_hidden_size=16,
        bi_num_attention_heads=2, v_biattention_id=(0,), t_biattention_id=(0,))
    rng = np.random.default_rng(0)
    word = rng.standard_normal((cfg.vocab_size, cfg.hidden_size)).astype(np.float32)
    sd = {"bert.embeddings.word_embeddings.weight": torch.from_numpy(word)}
    ckpt = tmp_path / "model.bin"
    torch.save(sd, str(ckpt))

    params = vlnbert_from_pretrained(ckpt.as_uri(), cfg, key=jax.random.PRNGKey(1),
                                     cache_dir=str(tmp_path / "cache"))
    assert np.allclose(np.asarray(params["bert"]["embeddings"]["word"]), word)
