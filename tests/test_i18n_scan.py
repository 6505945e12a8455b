"""i18n string scanner (reference `fish_speech/i18n/scan.py` equivalent)."""

import json

from fish_speech_tpu.i18n.core import I18nAuto, load_language_list
from fish_speech_tpu.i18n.scan import extract_i18n_keys, reconcile, scan_package


def test_extract_keys_from_source():
    src = """
from fish_speech_tpu.i18n import i18n
x = i18n("Hello")
y = module.i18n("Nested")
z = i18n(variable)        # not a literal -> ignored
w = i18n("a", "b")        # wrong arity -> ignored
q = other("NotI18n")
"""
    assert extract_i18n_keys(src) == {"Hello", "Nested"}


def test_scan_package_runs():
    keys = scan_package()
    assert isinstance(keys, set)


def test_reconcile_reports_drift(tmp_path, monkeypatch):
    import fish_speech_tpu.i18n.scan as scan_mod

    loc = tmp_path / "locale"
    loc.mkdir()
    (loc / "en_US.json").write_text(json.dumps({"Known": "Known", "Old": "x"}))
    (loc / "fr_FR.json").write_text(json.dumps({"Known": "Connu"}))
    monkeypatch.setattr(scan_mod, "I18N_FILE_PATH", loc)

    report = reconcile({"Known", "New"}, write=False)
    assert report["en_US"] == {"missing": ["New"], "stale": ["Old"]}
    assert report["fr_FR"] == {"missing": ["New"], "stale": []}

    reconcile({"Known", "New"}, write=True)
    en = json.loads((loc / "en_US.json").read_text())
    fr = json.loads((loc / "fr_FR.json").read_text())
    assert en == {"Known": "Known", "New": "New"}
    assert fr == {"Known": "Connu", "New": ""}


def test_i18n_lookup_fallback():
    i18n = I18nAuto(language="en_US")
    assert i18n("__missing_key__") == "__missing_key__"
    assert load_language_list("xx_XX") == {}
