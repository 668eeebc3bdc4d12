from .columns import safe_div, sorted_set, space_joined_products

__all__ = ["safe_div", "sorted_set", "space_joined_products"]
