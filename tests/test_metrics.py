"""Metric definition tests (SQuAD EM, HotPotQA F1, DPR has_answer)."""

from kirag_tpu.evaluation import ems, f1_score, has_answer, normalize_answer


class TestNormalize:
    def test_normalize(self):
        assert normalize_answer("The  Quick, Brown Fox!") == "quick brown fox"
        assert normalize_answer("An apple a day.") == "apple day"

    def test_ems(self):
        assert ems("The Beatles", ["beatles", "rolling stones"])
        assert not ems("queen", ["beatles"])


class TestF1:
    def test_overlap(self):
        f1, p, r = f1_score("Barack Obama", "Obama")
        assert r == 1.0 and p == 0.5
        assert abs(f1 - 2 * 0.5 / 1.5) < 1e-9

    def test_yes_no_guard(self):
        assert f1_score("yes", "no") == (0.0, 0.0, 0.0)
        assert f1_score("yes", "yes")[0] == 1.0
        # 'yes' prediction vs non-yes gold is zero even with token overlap
        assert f1_score("no", "no answer given") == (0.0, 0.0, 0.0)

    def test_disjoint(self):
        assert f1_score("cat", "dog") == (0.0, 0.0, 0.0)


class TestHasAnswer:
    def test_token_subsequence(self):
        text = "title: Lake Baikal text: It is the deepest lake in the world."
        assert has_answer(["deepest lake"], text)
        assert not has_answer(["shallow lake"], text)

    def test_word_boundary(self):
        # substring without token boundary must NOT match
        assert not has_answer(["ake"], "Lake Baikal")
        assert has_answer(["lake"], "Lake Baikal")

    def test_unicode_and_case(self):
        assert has_answer(["café"], "the CAFÉ was open")

    def test_regex_mode(self):
        assert has_answer([r"\d{4}"], "built in 1931", match_type="regex")
        assert not has_answer([r"\d{6}"], "built in 1931", match_type="regex")
