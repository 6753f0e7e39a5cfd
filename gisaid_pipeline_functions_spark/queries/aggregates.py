"""(placeholder — queries registered incrementally)"""
