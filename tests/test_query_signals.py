"""Query classification + signal extraction matrices.

Mirrors the reference's RuleBasedQueryClassifier / QueryAnalyzer breadth
(reference: RuleBasedQueryClassifier.swift:8-42, QueryAnalyzer.swift:3-247 —
intent OptionSet, entity/date/quoted detection, specificity).
"""
import pytest

from wax_tpu.text.analyzer import analyze_query, date_keys
from wax_tpu.text.classifier import AdaptiveFusionConfig, classify_query
from wax_tpu.types import QueryType


class TestClassifierMatrix:
    @pytest.mark.parametrize(
        "query,expected",
        [
            ("what happened yesterday", QueryType.TEMPORAL),
            ("show me notes from last week", QueryType.TEMPORAL),
            ("meetings 3 days ago", QueryType.TEMPORAL),
            ("latest update on the launch", QueryType.TEMPORAL),
            ("tell me about the storage engine", QueryType.EXPLORATORY),
            ("give me an overview of the project", QueryType.EXPLORATORY),
            ("summarize the design decisions", QueryType.EXPLORATORY),
            ("who owns the staging cluster", QueryType.FACTUAL),
            ("where is the cabin key", QueryType.FACTUAL),
            ("how many chips are in a v5e pod", QueryType.FACTUAL),
            ('find "exact phrase match"', QueryType.FACTUAL),
            ("retrieval engine design tradeoffs", QueryType.SEMANTIC),
            ("sourdough starter hydration", QueryType.SEMANTIC),
        ],
    )
    def test_routing(self, query, expected):
        assert classify_query(query) == expected

    def test_temporal_beats_factual(self):
        # cascade order: temporal wins even with a factual prefix
        assert classify_query("what happened yesterday at standup") == QueryType.TEMPORAL

    def test_when_was_x_born_is_factual_not_temporal(self):
        # the documented distinction: content dates are factual, not recency
        assert classify_query("when was Max born") == QueryType.FACTUAL

    def test_very_long_query_exploratory(self):
        q = " ".join(f"word{i}" for i in range(20))
        assert classify_query(q) == QueryType.EXPLORATORY

    def test_weights_cover_all_types_and_lanes(self):
        cfg = AdaptiveFusionConfig()
        for qt in QueryType:
            w = cfg.weights[qt]
            assert set(w) >= {"bm25", "vector"}
            assert all(v >= 0 for v in w.values())


class TestQuerySignals:
    def test_entities_exclude_sentence_initial(self):
        s = analyze_query("Where does Ana keep the Lisbon keys")
        assert "Ana" in s.entity_terms and "Lisbon" in s.entity_terms
        assert "Where" not in s.entity_terms  # sentence-initial capital

    def test_all_caps_counts_as_entity(self):
        s = analyze_query("configure the NASA feed")
        assert "NASA" in s.entity_terms

    def test_quoted_phrases(self):
        s = analyze_query('find "exact phrase" and \'another one\'')
        assert "exact phrase" in s.quoted_phrases and "another one" in s.quoted_phrases

    def test_years_and_dates(self):
        s = analyze_query("trips in 2021 and on 03/14")
        assert "2021" in s.years
        assert s.asks_date

    def test_intents_set_matches_flags(self):
        s = analyze_query("who owns the cabin near Lisbon and when was it bought")
        assert s.asks_ownership and ("asks_ownership" in s.intents)
        assert s.asks_location == ("asks_location" in s.intents)
        assert s.asks_date == ("asks_date" in s.intents)

    def test_specificity_ordering(self):
        vague = analyze_query("the of and a")
        specific = analyze_query('meeting with "Dr. Chen" about Q3 roadmap 2024')
        assert specific.specificity > vague.specificity
        assert 0.0 <= vague.specificity <= 1.0 and specific.specificity <= 1.0

    def test_content_terms_deduped_lowercase(self):
        s = analyze_query("Paris paris PARIS trip")
        assert s.content_terms.count("paris") == 1

    def test_empty_query(self):
        s = analyze_query("")
        assert s.entity_terms == () and s.content_terms == ()
        assert s.specificity <= 0.2

    def test_date_keys_normalize(self):
        a = date_keys("born on March 3, 2021")
        b = date_keys("born 2021-03-03")
        assert set(a) & set(b), (a, b)  # both resolve to a shared canonical key
