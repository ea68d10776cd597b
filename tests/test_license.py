"""Offline HMAC license validation (reference: LicenseValidator, disabled by default)."""
from wax_tpu.surfaces.license import issue_license, license_required, validate_license


class TestLicense:
    def test_roundtrip(self):
        tok = issue_license("acme", "secret1", expires_ms=2_000_000_000_000)
        info = validate_license(tok, "secret1", now_ms=1_000)
        assert info.valid and info.licensee == "acme"

    def test_wrong_secret(self):
        tok = issue_license("acme", "secret1")
        assert not validate_license(tok, "secret2").valid

    def test_expired(self):
        tok = issue_license("acme", "s", expires_ms=1_000)
        info = validate_license(tok, "s", now_ms=2_000)
        assert not info.valid and info.reason == "expired"

    def test_malformed(self):
        assert not validate_license("garbage", "s").valid
        assert not validate_license("a.b.c.d", "s").valid

    def test_disabled_by_default(self, monkeypatch):
        monkeypatch.delenv("WAX_TPU_FEATURE_LICENSE", raising=False)
        assert not license_required()
        monkeypatch.setenv("WAX_TPU_FEATURE_LICENSE", "1")
        assert license_required()
