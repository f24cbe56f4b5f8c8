"""(round-1 placeholder)"""
