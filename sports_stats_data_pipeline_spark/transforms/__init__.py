from .silver import fighters_silver, fights_silver

__all__ = ["fighters_silver", "fights_silver"]
