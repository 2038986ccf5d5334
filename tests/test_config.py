"""Config resolution + validation parity (M6/S7 —
ocr_tesserocr.py:247-277, celery_app.py:726-772)."""

import pytest

from ocr_ray.config import OcrConfig, parse_other_params, resolve_config, verify_params


def test_defaults():
    cfg = resolve_config()
    assert cfg.engine == "pixel"
    assert cfg.lang == ("por",)
    assert cfg.engine_mode == 3 and cfg.segment_mode == 3 and cfg.threshold_method == 0


def test_lang_spec_plus_join():
    cfg = resolve_config({"lang": ["por", "eng"]})
    assert cfg.lang_spec == "por+eng"


def test_other_params_string_parse():
    assert parse_other_params("a=1; b = x y ;") == (("a", "1"), ("b", "x y"))
    with pytest.raises(ValueError):
        parse_other_params("noequals")


def test_validation_errors_portuguese():
    ok, errors = verify_params({"lang": ["klingon"], "engineMode": 9,
                                "segmentMode": 0, "thresholdMethod": 7,
                                "outputs": ["doc"], "dpi": 1.5,
                                "otherParams": "notadict"})
    assert not ok
    assert any(e.startswith("Língua:") for e in errors)
    assert any(e.startswith("Modo do motor:") for e in errors)
    assert any(e.startswith("Segmentação:") for e in errors)
    assert any(e.startswith("Thresholding:") for e in errors)
    assert any(e.startswith("Formato de resultado:") for e in errors)
    assert any(e.startswith("DPI:") for e in errors)
    assert any(e.startswith("Outros parâmetros:") for e in errors)


def test_resolve_rejects_invalid():
    with pytest.raises(ValueError):
        resolve_config({"lang": ["xx"]})


def test_overlay_and_overrides():
    cfg = resolve_config({"outputs": ["txt", "csv"], "dpi": "300",
                          "otherParams": "tessedit_char_whitelist=abc"})
    assert cfg.outputs == ("txt", "csv")
    assert cfg.dpi == 300
    assert cfg.other_params == (("tessedit_char_whitelist", "abc"),)
    cfg2 = cfg.with_overrides(engine="stub", lang=("eng",))
    assert cfg2.lang == ("eng",) and cfg2.outputs == ("txt", "csv")
    assert isinstance(cfg2, OcrConfig)
