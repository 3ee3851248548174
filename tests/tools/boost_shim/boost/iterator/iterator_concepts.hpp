// Test-only shim: included by constants.hh, nothing from it is used.
#ifndef TAXTK_SHIM_BOOST_ITERATOR_CONCEPTS_HPP
#define TAXTK_SHIM_BOOST_ITERATOR_CONCEPTS_HPP
#endif
