from fish_speech_tpu.config import (
    DACConfig,
    DualARConfig,
    dac_s2_pro,
    dac_tiny,
    dual_ar_s2_pro,
    dual_ar_tiny,
)


def test_resolve_defaults():
    cfg = DualARConfig(dim=256, n_head=4, head_dim=None, intermediate_size=None).resolve()
    assert cfg.n_local_heads == cfg.n_head
    # reference formula: find_multiple(int(2*4*dim/3), 256)
    assert cfg.intermediate_size == 768
    assert cfg.fast_dim == cfg.dim
    assert cfg.fast_attention_qk_norm == cfg.attention_qk_norm


def test_fast_overrides_inherit():
    cfg = DualARConfig(attention_qk_norm=True, fast_attention_qk_norm=False).resolve()
    assert cfg.attention_qk_norm is True
    assert cfg.fast_attention_qk_norm is False


def test_json_roundtrip(tmp_path):
    cfg = dual_ar_tiny()
    p = tmp_path / "config.json"
    cfg.to_json(str(p))
    cfg2 = DualARConfig.from_json(str(p))
    assert cfg2 == cfg


def test_fish_qwen3_omni_layout():
    data = {
        "model_type": "fish_qwen3_omni",
        "semantic_start_token_id": 100,
        "semantic_end_token_id": 4195,
        "text_config": {
            "vocab_size": 5000,
            "n_layer": 2,
            "n_head": 4,
            "dim": 128,
            "head_dim": 32,
        },
        "audio_decoder_config": {
            "vocab_size": 4096,
            "num_codebooks": 10,
            "n_layer": 2,
            "dim": 64,
        },
    }
    cfg = DualARConfig.from_json(data)
    assert cfg.model_type == "dual_ar"
    assert cfg.scale_codebook_embeddings and cfg.norm_fastlayer_input
    assert cfg.semantic_begin_id == 100 and cfg.semantic_end_id == 4195
    assert cfg.codebook_size == 4096 and cfg.num_codebooks == 10
    assert cfg.fast_dim == 64 and cfg.n_fast_layer == 2


def test_codec_frame_math():
    cfg = dac_s2_pro()
    assert cfg.hop_length == 512
    assert cfg.frame_length == 2048
    assert abs(cfg.tokens_per_second - 21.53) < 0.01
    assert cfg.resolved_latent_dim == 1024


def test_tiny_presets_hashable():
    hash(dual_ar_tiny())
    hash(dac_tiny())
    hash(dual_ar_s2_pro())
