from .money import avg_money_2dp, cents, pct_2dp, round2_sum

__all__ = ["cents", "avg_money_2dp", "pct_2dp", "round2_sum"]
