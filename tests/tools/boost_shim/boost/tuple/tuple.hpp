// Minimal header-only stand-in for boost/tuple, sufficient for the
// subset the reference sources use (tests/tools/rpa_ref_oracle.cpp):
// boost::tuple<T...>, make_tuple, tie, free boost::get<N>, member
// .get<N>(), converting construction/assignment, and (via the std::tuple
// base found by ADL) the comparison operators pulled in through
// tuple_comparison.hpp.  Test-only shim; NOT part of the framework.
#ifndef TAXTK_SHIM_BOOST_TUPLE_HPP
#define TAXTK_SHIM_BOOST_TUPLE_HPP

#include <tuple>
#include <type_traits>
#include <utility>

namespace boost {

template <class... Ts>
struct tuple : std::tuple<Ts...> {
    using base_type = std::tuple<Ts...>;
    tuple() = default;
    using base_type::base_type;  // element-wise constructors
    template <class... Us>
    tuple(const std::tuple<Us...>& o) : base_type(o) {}
    template <class... Us>
    tuple(const tuple<Us...>& o)
        : base_type(static_cast<const std::tuple<Us...>&>(o)) {}
    template <class... Us>
    tuple& operator=(const std::tuple<Us...>& o) {
        base_type::operator=(o);
        return *this;
    }
    template <int N>
    typename std::tuple_element<N, base_type>::type& get() {
        return std::get<N>(*this);
    }
    template <int N>
    const typename std::tuple_element<N, base_type>::type& get() const {
        return std::get<N>(*this);
    }
};

template <int N, class... Ts>
typename std::tuple_element<N, std::tuple<Ts...>>::type& get(
    tuple<Ts...>& t) {
    return std::get<N>(t);
}
template <int N, class... Ts>
const typename std::tuple_element<N, std::tuple<Ts...>>::type& get(
    const tuple<Ts...>& t) {
    return std::get<N>(t);
}

template <class... Ts>
tuple<typename std::decay<Ts>::type...> make_tuple(Ts&&... xs) {
    return tuple<typename std::decay<Ts>::type...>(
        std::make_tuple(std::forward<Ts>(xs)...));
}

template <class... Ts>
std::tuple<Ts&...> tie(Ts&... xs) {
    return std::tie(xs...);
}

}  // namespace boost

#endif
