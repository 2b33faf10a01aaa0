from .merge import first_wins_dedup, insert_if_absent

__all__ = ["first_wins_dedup", "insert_if_absent"]
